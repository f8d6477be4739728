package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: the unbounded-stream twin of the
  * batch `report_drift` query. Incoming documents are reduced to 256
  * hashed-token-bucket counts per micro-batch (a bounded aggregation —
  * the shuffle carries at most 256 rows per batch regardless of batch
  * size), compared against a FIXED reference mixture captured from the
  * curated corpus, and each batch writes one (batch_id, n_tokens,
  * drift) row to the monitor sink.
  *
  * Scale posture: the reference histogram is a 256-element broadcast
  * local to each batch; per-batch state is NONE (drift is a per-batch
  * statistic, not a running aggregate), so the query is stateless. The
  * sink write is idempotent on batch_id (each batch overwrites ITS OWN
  * batch_id partition, dynamic-overwrite mode), so foreachBatch's
  * at-least-once replay after a crash between sink write and checkpoint
  * commit lands on the same partition instead of duplicating the row —
  * that, not statelessness alone, is what makes restarts correct.
  * Alerting is a downstream filter on the drift column.
  */
object StreamingDrift {

  final case class Doc(doc_id: Long, text: String)

  /** 256-bucket hashed-token histogram of a static corpus, normalized —
    * the reference mixture a stream is judged against. Collected to a
    * driver array (256 doubles) once, at monitor construction. A corpus
    * with no tokens has no mixture to normalize against — that is a
    * caller error, rejected here rather than silently poisoning every
    * subsequent drift reading with NaN. */
  def referenceMixture(docs: DataFrame): Array[Double] = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("int").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val hist = new Array[Double](256)
    var total = 0L
    counts.foreach { r => total += r.getLong(1) }
    require(total > 0L,
      "reference corpus has no tokens — cannot normalize a mixture")
    counts.foreach { r => hist(r.getInt(0)) = r.getLong(1).toDouble / total }
    hist
  }

  /** Per-batch L1 (Manhattan) drift Σ|p_batch − p_ref| of the stream
    * against `ref` — range [0, 2], twice the total-variation distance;
    * the same convention as the batch `report_drift` query — written to
    * `outDir` as one row per micro-batch. Runs until the AvailableNow
    * drain completes. */
  def monitor(
      stream: Dataset[Doc],
      ref: Array[Double],
      outDir: String,
      checkpointDir: String): Unit = {
    val spark = stream.sparkSession
    val refBc = spark.sparkContext.broadcast(ref)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        import batch.sparkSession.implicits._
        // bounded: at most 256 groups leave the per-batch aggregation
        val counts = batch
          .select(explode(split(col("text"), " ")).as("tok"))
          .select(conv(substring(md5(col("tok")), 1, 2), 16, 10)
            .cast("int").as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("c"))
          .collect()
        val total = counts.map(_.getLong(1)).sum
        if (total > 0L) {
          val r = refBc.value
          val obs = new Array[Double](256)
          counts.foreach(row => obs(row.getInt(0)) = row.getLong(1).toDouble / total)
          var drift = 0.0
          var i = 0
          while (i < 256) { drift += math.abs(obs(i) - r(i)); i += 1 }
          // idempotent on batch_id: a replayed batch overwrites its own
          // partition (dynamic mode leaves every other batch's intact)
          Seq((batchId, total, drift))
            .toDF("batch_id", "n_tokens", "drift")
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }
}
