package graft

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.Ev
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState closes sessions on gap and watermark timeout") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("stateful-in")
    // user 1: two sessions separated by a >30min gap; user 2: one session.
    // The 12:00 event drives the watermark far enough to time both out.
    Seq(
      Ev(1L, ts("2024-01-01 10:00:00")),
      Ev(1L, ts("2024-01-01 10:10:00")),
      Ev(1L, ts("2024-01-01 11:00:00")),
      Ev(2L, ts("2024-01-01 10:05:00")),
      Ev(9L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts").coalesce(1).write.parquet(dir + "/in")

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(dir + "/in").as[Ev]

    val q = StatefulSessionize.sessions(stream, gapMinutes = 30)
      .writeStream
      .outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", tmpDir("stateful-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("sessions_out")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L)))
    assert(rows.contains((2L, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1L)))
    // user 1's second session (11:00) times out only once the watermark
    // (12:00 - 30min = 11:30) passes 11:00+30min — right at the boundary;
    // whether it sealed depends on the final empty batch. Its first
    // session MUST be closed by the in-stream gap regardless.
    assert(rows.exists(_._1 == 1L))
  }
}
