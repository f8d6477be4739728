package graft

import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.Doc
import org.apache.spark.sql.types._

/** Streaming drift monitor: an on-mixture batch must read ~0 drift, an
  * off-mixture batch must read high, and each micro-batch appends
  * exactly one monitor row. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch total-variation drift separates on-mixture from off-mixture batches") {
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
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(schema).parquet(in).as[Doc]
    StreamingDrift.monitor(stream, ref, out, ckpt)

    val rows = spark.read.parquet(out)
      .select($"batch_id", $"n_tokens", $"drift")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2, s"one monitor row per micro-batch, got ${rows.toSeq}")
    val drifts = rows.map(_._3)
    assert(drifts.min < 1e-9, "the on-mixture batch reads ~0")
    assert(drifts.max > 1.5, "the disjoint-vocabulary batch reads near the TV bound")
    rows.foreach { case (_, _, d) => assert(d >= 0.0 && d <= 2.0 + 1e-9) }
  }
}
