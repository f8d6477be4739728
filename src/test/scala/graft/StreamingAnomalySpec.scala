package graft

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.Ev
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Stateful streaming anomaly detection: the EW mean/variance state must
  * survive across micro-batches AND restarts (checkpointed state store),
  * flag exactly the planted spike once warm, and absorb the spike into
  * the estimate instead of flagging forever. */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("EW state persists across restarts; only the planted spike is flagged") {
    val in = tmpDir("anom-in") + "/files"
    val ckpt = tmpDir("anom-ckpt")
    val out = tmpDir("anom-out") + "/out"

    // parquet sink: the memory sink cannot recover from a checkpoint, and
    // the restart is the point of this test
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in).as[Ev]
      val q = StreamingAnomaly.anomalies(stream, warmup = 8)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // Batch 1: 12 alternating stable values — warms the estimate past the
    // warmup floor; nothing here is anomalous.
    val base = (0 until 12).map { i =>
      Ev(i.toLong, 1L, ts(f"2024-01-01 10:${i}%02d:00"),
        if (i % 2 == 0) 9.9 else 10.1)
    }
    base.toDF("event_id", "user_id", "ts", "value").coalesce(1).write.parquet(in)
    run()
    assert(spark.read.schema(StreamingAnomaly.anomalySchema)
      .parquet(out).count() == 0, "stable warmup stream must not flag")

    // Batch 2 (fresh query, same checkpoint): a spike, then more stable
    // values near the spike-absorbed mean — only the spike may flag. The
    // state carrying ewma≈10 across the restart is what flags 100.0.
    Seq(
      Ev(100L, 1L, ts("2024-01-01 10:12:00"), 100.0),
      Ev(101L, 1L, ts("2024-01-01 10:13:00"), 35.0),
      Ev(102L, 1L, ts("2024-01-01 10:14:00"), 30.0))
      .toDF("event_id", "user_id", "ts", "value").coalesce(1)
      .write.mode("append").parquet(in)
    run()

    val flagged = spark.read.parquet(out)
      .select($"event_id", $"user_id", $"value", $"ewma", $"bound")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(flagged.map(_._3).toSet == Set(100.0),
      s"exactly the spike flags, got ${flagged.toSeq}")
    val (eid, u, v, ewma, bound) = flagged.head
    assert(eid == 100L, "the flag carries its source event's id")
    assert(u == 1L)
    assert(ewma > 9.8 && ewma < 10.2, "flag is judged against the PRE-spike mean")
    assert(math.abs(v - ewma) > bound)
    // 35.0 after the spike is inside the spike-inflated band: the
    // estimate absorbed the level shift instead of flagging forever.
  }

  test("per-key isolation: one user's spike never flags another user") {
    val in = tmpDir("anom-iso-in") + "/files"
    val both = (0 until 12).flatMap { i =>
      Seq(
        Ev(2L * i, 1L, ts(f"2024-01-01 10:${i}%02d:00"), if (i % 2 == 0) 9.9 else 10.1),
        Ev(2L * i + 1, 2L, ts(f"2024-01-01 10:${i}%02d:30"), if (i % 2 == 0) 99.0 else 101.0))
    } :+ Ev(999L, 2L, ts("2024-01-01 10:12:30"), 1000.0)
    both.toDF("event_id", "user_id", "ts", "value").coalesce(1).write.parquet(in)

    val stream = spark.readStream.schema(schema).parquet(in).as[Ev]
    val q = StreamingAnomaly.anomalies(stream, warmup = 8)
      .writeStream
      .outputMode("append")
      .format("memory").queryName("anomalies_iso_out")
      .option("checkpointLocation", tmpDir("anom-iso-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val flagged = spark.table("anomalies_iso_out")
      .select($"event_id", $"user_id", $"value").as[(Long, Long, Double)].collect()
    assert(flagged.toSet == Set((999L, 2L, 1000.0)),
      s"only user 2's spike flags, got ${flagged.toSeq}")
  }
}
