package graft

import graft.operators.KmeansOps
import graft.streaming.StreamingClusterMonitor
import graft.streaming.StreamingClusterMonitor.Emb
import org.apache.spark.sql.types._

/** Streaming cluster-occupancy drift: a batch drawn with the training
  * mixture must read ~0, a batch collapsed into ONE semantic cluster must
  * read ≈ 2·(1 − that cluster's share) — the shift that token and
  * covariance monitors under-report — each micro-batch owns exactly one
  * row, and replay overwrites. */
class StreamingClusterMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Three well-separated blobs on distinct axes, round-robin by id. */
  private def blob(i: Int, which: Int): Seq[Float] =
    (0 until dim).map { d =>
      val jitter = (i % 5 - 2) * 0.01
      (if (d == which) 0.9 + jitter else 0.02 * jitter).toFloat
    }

  test("occupancy L1 separates a cluster-collapsed batch from an in-mixture batch") {
    val corpus = (0 until 90).map(i => (i.toLong, blob(i, i % 3)))
    val df = corpus.toDF("vec_id", "embedding")
    val (assigned, model) = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 3, rounds = 4)
    val ref = StreamingClusterMonitor.referenceOccupancy(assigned)
    assert(ref.size == 3 && math.abs(ref.values.sum - 1.0) < 1e-12)
    ref.values.foreach(s => assert(math.abs(s - 1.0 / 3) < 1e-9,
      s"round-robin corpus must be balanced, got $ref"))

    val in = tmpDir("cmon-in") + "/files"
    val out = tmpDir("cmon-out") + "/out"
    // batch 1: the training mixture re-idd (drift 0); batch 2: every
    // vector from blob 0 (a new source piling into one semantic cluster)
    (0 until 30).map(i => (1000L + i, blob(i, i % 3)))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(in)
    (0 until 30).map(i => (2000L + i, blob(i, 0)))
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(in)

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(schema).parquet(in).as[Emb]
    StreamingClusterMonitor.monitor(stream, model, ref, dim, out, tmpDir("cmon-ckpt"))

    val rows = spark.read.parquet(out)
      .select($"batch_id".cast("long"), $"n_vecs", $"occ_l1")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2, s"one row per micro-batch, got ${rows.toSeq}")
    val drifts = rows.map(_._3)
    assert(drifts.min < 1e-9, s"in-mixture batch must read ~0, got ${drifts.min}")
    // all mass in one cluster: |1 - 1/3| + 2*|0 - 1/3| = 4/3
    assert(math.abs(drifts.max - 4.0 / 3) < 1e-9,
      s"collapsed batch must read 4/3, got ${drifts.max}")

    // replay through a fresh checkpoint: overwrite, not duplicate
    StreamingClusterMonitor.monitor(stream, model, ref, dim, out, tmpDir("cmon-ckpt2"))
    val replayed = spark.read.parquet(out)
      .select($"batch_id".cast("long")).as[Long].collect().sorted
    assert(replayed.toSeq == Seq(0L, 1L),
      s"replayed batches must overwrite, not duplicate: ${replayed.toSeq}")
  }

  test("referenceOccupancy rejects an empty assignment; L1 handles absent clusters") {
    intercept[IllegalArgumentException] {
      StreamingClusterMonitor.referenceOccupancy(
        Seq.empty[(Long, Long)].toDF("vec_id", "cluster"))
    }
    // batch misses cluster 2 entirely and over-fills 0
    val l1 = StreamingClusterMonitor.occupancyL1(
      Map(0L -> 0.5, 1L -> 0.25, 2L -> 0.25),
      Map(0L -> 3L, 1L -> 1L))
    assert(math.abs(l1 - (0.25 + 0.0 + 0.25)) < 1e-12, s"got $l1")
  }
}
