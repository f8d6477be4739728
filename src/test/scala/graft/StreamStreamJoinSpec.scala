package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Stream–stream inner join with watermarks and an event-time range
  * condition — the streaming twin of the batch as-of/range joins (E5/E6).
  * State on both sides is bounded by the watermark + range bound, which is
  * what makes the operator viable on an unbounded 100 TB/day feed: Spark
  * drops buffered rows once they can no longer match. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked stream-stream join matches events to orders within 10 minutes") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("ss-join")

    Seq( // clicks stream
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 10:20:00")),
      (3L, 200L, ts("2024-01-01 10:05:00")),
      (4L, 300L, ts("2024-01-01 12:00:00")) // late bucket, advances watermark
    ).toDF("event_id", "user_id", "ev_ts")
      .coalesce(1).write.parquet(dir + "/events")

    Seq( // orders stream
      (10L, 100L, ts("2024-01-01 10:03:00")), // within 10min of event 1
      (11L, 100L, ts("2024-01-01 10:45:00")), // matches nothing
      (12L, 200L, ts("2024-01-01 10:06:00")), // within 10min of event 3
      (13L, 300L, ts("2024-01-01 12:00:00"))  // same-instant match of event 4
    ).toDF("order_id", "o_user_id", "o_ts")
      .coalesce(1).write.parquet(dir + "/orders")

    val evSchema = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("ev_ts", TimestampType)))
    val orSchema = StructType(Seq(StructField("order_id", LongType),
      StructField("o_user_id", LongType), StructField("o_ts", TimestampType)))

    val ev = spark.readStream.schema(evSchema).parquet(dir + "/events")
      .withWatermark("ev_ts", "30 minutes")
    val or = spark.readStream.schema(orSchema).parquet(dir + "/orders")
      .withWatermark("o_ts", "30 minutes")

    val q = ev.join(or,
        col("user_id") === col("o_user_id") &&
          col("o_ts") >= col("ev_ts") &&
          col("o_ts") <= col("ev_ts") + expr("INTERVAL 10 MINUTES"))
      .select("event_id", "order_id")
      .writeStream
      .outputMode("append")
      .format("memory").queryName("ss_join_out")
      .option("checkpointLocation", tmpDir("ss-join-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ss_join_out").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 12L), (4L, 13L)))
  }
}
