package graft

import graft.streaming.RunningCounts
import graft.streaming.RunningCounts.Ev
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Spark 4 transformWithState: state persists across restarts via the
  * checkpoint, and every touched key emits its updated running total. */
class RunningCountsSpec extends SparkSpec {
  import spark.implicits._

  test("running per-key totals accumulate across two runs of the same checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = tmpDir("tws")
      val ckpt = tmpDir("tws-ckpt")
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType)))

      val emitted = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      def run(): Unit = {
        val ev = spark.readStream.schema(schema).parquet(dir + "/in").as[Ev]
        val q = RunningCounts.totals(ev)
          .writeStream.outputMode("update")
          // foreachBatch: the sink shape that supports checkpoint recovery
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[RunningCounts.KeyCount], _: Long) =>
            emitted.synchronized {
              emitted ++= batch.collect().map(kc => (kc.user_id, kc.n))
            }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      // the file source lists the input dir flat — land each batch's part
      // file directly in /in under a unique name
      def land(batch: String): Unit = {
        val src = java.nio.file.Paths.get(dir, batch)
        val part = java.nio.file.Files.list(src)
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(dir, "in", s"$batch.parquet"))
      }

      Seq(Ev(1L, ts("2024-01-01 10:00:00")), Ev(1L, ts("2024-01-01 10:01:00")),
        Ev(2L, ts("2024-01-01 10:02:00")))
        .toDF().coalesce(1).write.parquet(dir + "/batch1")
      land("batch1")
      run()
      assert(emitted.toSet == Set((1L, 2L), (2L, 1L)))

      Seq(Ev(1L, ts("2024-01-01 11:00:00")), Ev(3L, ts("2024-01-01 11:01:00")))
        .toDF().coalesce(1).write.parquet(dir + "/batch2")
      land("batch2")
      run()
      val latest = emitted.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      // user 1 continued from state 2 -> 3; user 3 is new
      assert(latest == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
