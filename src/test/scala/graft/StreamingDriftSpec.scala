package graft

import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.Doc
import org.apache.spark.sql.types._

/** Streaming drift monitor: an on-mixture batch must read ~0 drift, an
  * off-mixture batch must read high, each micro-batch owns exactly one
  * monitor row, and a replayed batch lands on its own row instead of
  * duplicating it. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch L1 drift separates on-mixture from off-mixture batches") {
    val refText = "alpha beta gamma delta epsilon zeta eta theta"
    val refDocs = Seq.tabulate(8)(i => (i.toLong, refText))
      .toDF("doc_id", "text")
    val ref = StreamingDrift.referenceMixture(refDocs)
    assert(math.abs(ref.sum - 1.0) < 1e-9, "reference mixture is normalized")

    val in = tmpDir("drift-in") + "/files"
    val out = tmpDir("drift-out") + "/out"
    val ckpt = tmpDir("drift-ckpt")
    // batch 1: same mixture as the reference; batch 2: disjoint vocabulary
    Seq((100L, refText), (101L, refText))
      .toDF("doc_id", "text").coalesce(1).write.parquet(in)
    Seq((200L, "qq ww ee rr tt yy uu ii"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(schema).parquet(in).as[Doc]
    StreamingDrift.monitor(stream, ref, out, ckpt)

    val rows = spark.read.parquet(out)
      .select($"batch_id".cast("long"), $"n_tokens", $"drift")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2, s"one monitor row per micro-batch, got ${rows.toSeq}")
    val drifts = rows.map(_._3)
    assert(drifts.min < 1e-9, "the on-mixture batch reads ~0")
    // L1 = 2x total variation, so the bound is 2 and a disjoint
    // vocabulary approaches it
    assert(drifts.max > 1.5, "the disjoint-vocabulary batch reads near the L1 bound")
    rows.foreach { case (_, _, d) => assert(d >= 0.0 && d <= 2.0 + 1e-9) }

    // Replay: a fresh checkpoint re-delivers the same batch ids (the
    // at-least-once crash-recovery case). The batch_id-partitioned
    // dynamic overwrite must land each replayed row on its own
    // partition — still one row per batch, not appended duplicates.
    StreamingDrift.monitor(stream, ref, out, tmpDir("drift-ckpt2"))
    val replayed = spark.read.parquet(out)
      .select($"batch_id".cast("long")).as[Long].collect().sorted
    assert(replayed.toSeq == Seq(0L, 1L),
      s"replayed batches must overwrite, not duplicate: ${replayed.toSeq}")
  }

  test("referenceMixture rejects a token-less corpus instead of returning NaNs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      StreamingDrift.referenceMixture(empty)
    }
  }
}
