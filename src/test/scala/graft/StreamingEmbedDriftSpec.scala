package graft

import graft.streaming.StreamingEmbedDrift
import graft.streaming.StreamingEmbedDrift.Emb
import org.apache.spark.sql.types._

/** Streaming covariance-drift monitor: a same-geometry batch must read
  * exactly 0 (identical vectors → identical exact integer sums →
  * bit-identical covariance cells), a geometry-shifted batch must read
  * high while its TOKEN statistics would not move, each micro-batch owns
  * exactly one monitor row, and a replayed batch overwrites its own row. */
class StreamingEmbedDriftSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vecs(scale0: Float): Seq[Seq[Float]] =
    (0 until 30).map { i =>
      val a = (i % 7 - 3) * 0.1f
      (0 until dim).map(d => if (d == 0) a * scale0 else a * 0.5f / (d + 1))
    }

  test("frobenius covariance drift separates geometry shifts; idempotent replay") {
    val refDf = vecs(1f).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val ref = StreamingEmbedDrift.referenceCovariance(refDf, dim)
    assert(ref.length == dim * (dim + 1) / 2)

    val in = tmpDir("edrift-in") + "/files"
    val out = tmpDir("edrift-out") + "/out"
    // batch 1: the same vectors re-idd — a token monitor AND this one both
    // read zero; batch 2: dimension 0 scaled 3x — token stats untouched,
    // geometry moved
    vecs(1f).zipWithIndex.map { case (v, i) => (100L + i, v) }
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(in)
    vecs(3f).zipWithIndex.map { case (v, i) => (200L + i, v) }
      .toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(in)

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(schema).parquet(in).as[Emb]
    StreamingEmbedDrift.monitor(stream, ref, dim, out, tmpDir("edrift-ckpt"))

    val rows = spark.read.parquet(out)
      .select($"batch_id".cast("long"), $"n_vecs", $"frob_drift")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2, s"one monitor row per micro-batch, got ${rows.toSeq}")
    val drifts = rows.map(_._3)
    // identical vectors → identical exact integer sums → drift EXACTLY 0
    assert(drifts.min == 0.0, s"same-geometry batch must read exactly 0, got ${drifts.min}")
    assert(drifts.max > 1e-3, s"shifted-geometry batch must read high, got ${drifts.max}")

    // replay through a fresh checkpoint: same batch ids, overwrite not append
    StreamingEmbedDrift.monitor(stream, ref, dim, out, tmpDir("edrift-ckpt2"))
    val replayed = spark.read.parquet(out)
      .select($"batch_id".cast("long")).as[Long].collect().sorted
    assert(replayed.toSeq == Seq(0L, 1L),
      s"replayed batches must overwrite, not duplicate: ${replayed.toSeq}")
  }

  test("referenceCovariance rejects a corpus with fewer than 2 vectors") {
    val one = Seq((0L, (0 until dim).map(_.toFloat))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      StreamingEmbedDrift.referenceCovariance(one, dim)
    }
  }
}
