package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming windowed aggregation over an events-shaped stream:
  * watermark + tumbling window + append sink. The reference has no true
  * stream surface (SURVEY §2 G), but the engine supports continuous
  * analytics over the same schema the batch C7 patterns use. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup within watermark drops duplicate ids, keeps first") {
    val dir = tmpDir("stream-dedup")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      ("m1", ts("2024-01-01 10:00:00"), "first"),
      ("m1", ts("2024-01-01 10:03:00"), "dup-of-first"),
      ("m2", ts("2024-01-01 10:05:00"), "second")
    ).toDF("message_id", "ts", "payload")
      .coalesce(1).write.parquet(dir + "/in")

    val schema = StructType(Seq(
      StructField("message_id", StringType),
      StructField("ts", TimestampType),
      StructField("payload", StringType)))
    val q = spark.readStream.schema(schema).parquet(dir + "/in")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("message_id")
      .writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", tmpDir("dedup-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("dedup_out")
      .select("message_id", "payload").as[(String, String)].collect().toSet
    assert(rows == Set(("m1", "first"), ("m2", "second")))
  }

  test("watermarked tumbling-window counts over a file stream") {
    val dir = tmpDir("stream-events")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 10:00:10"), "click", 1.0),
      (2L, ts("2024-01-01 10:00:50"), "click", 2.0),
      (3L, ts("2024-01-01 10:01:10"), "view", 3.0),
      (4L, ts("2024-01-01 10:02:05"), "click", 4.0),
      (5L, ts("2024-01-01 10:30:00"), "view", 5.0) // advances watermark far past earlier windows
    ).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(dir + "/in")

    val stream = spark.readStream.schema(schema).parquet(dir + "/in")
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

    val q = agg.writeStream
      .outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", tmpDir("stream-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("win_out")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("total"))
      .as[(String, String, Long, Double)].collect().toSet
    // Windows sealed by the watermark (everything before 10:20):
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:01:00", "view", 1L, 3.0)))
    assert(rows.contains(("2024-01-01 10:02:00", "click", 1L, 4.0)))
    // The 10:30 window is NOT sealed yet (watermark = 10:20) — append mode
    // must withhold it.
    assert(!rows.exists(_._1 == "2024-01-01 10:30:00"))
  }

  test("update-mode streaming aggregate maintains the C4 stats view incrementally") {
    val dir = tmpDir("stream-ivm")
    val schema = StructType(Seq(
      StructField("provider", StringType),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def land(name: String, rows: Seq[(String, java.sql.Timestamp)]): Unit = {
      val tmp = tmpDir("ivm-batch")
      rows.toDF("provider", "ts").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "in"))
      java.nio.file.Files.move(part, java.nio.file.Paths.get(dir, "in", s"$name.parquet"))
    }

    val updates = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir + "/in")
        .groupBy(col("provider"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("latest"))
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          updates.synchronized {
            updates ++= b.select("provider", "n").as[(String, Long)].collect()
          }; ()
        }
        .option("checkpointLocation", dir + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    land("b1", Seq(("gmail", ts("2024-01-01 10:00:00")),
      ("gmail", ts("2024-01-01 10:01:00")), ("imap", ts("2024-01-01 10:02:00"))))
    run()
    assert(updates.toSet == Set(("gmail", 2L), ("imap", 1L)))

    // next batch touches only gmail: update mode re-emits just that group,
    // with the total maintained incrementally from state
    land("b2", Seq(("gmail", ts("2024-01-01 11:00:00"))))
    run()
    val latest = updates.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(latest == Map("gmail" -> 3L, "imap" -> 1L))
    assert(updates.count(_._1 == "imap") == 1, "untouched group must not re-emit")
  }

  test("native session_window merges gap-bounded events per user") {
    val dir = tmpDir("stream-sess")
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq( // user 1: two sessions (gap > 5 min splits); user 2: one session
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:03:00")), // same session (3 min gap)
      (1L, ts("2024-01-01 10:20:00")), // new session (17 min gap)
      (2L, ts("2024-01-01 10:01:00")),
      (9L, ts("2024-01-01 12:00:00")) // watermark driver
    ).toDF("user_id", "ts").coalesce(1).write.parquet(dir + "/in")

    val q = spark.readStream.schema(schema).parquet(dir + "/in")
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").cast("string").as("start"),
        col("session_window.end").cast("string").as("end"), col("n"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("sess_out")
      .as[(Long, String, String, Long)].collect().toSet
    // session end = last event + gap
    assert(rows.contains((1L, "2024-01-01 10:00:00", "2024-01-01 10:08:00", 2L)))
    assert(rows.contains((1L, "2024-01-01 10:20:00", "2024-01-01 10:25:00", 1L)))
    assert(rows.contains((2L, "2024-01-01 10:01:00", "2024-01-01 10:06:00", 1L)))
  }
}
