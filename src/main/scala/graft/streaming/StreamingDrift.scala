package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: the unbounded-stream twin of the
  * batch `report_drift` query. Incoming documents are reduced to 256
  * hashed-token-bucket counts per micro-batch (a bounded aggregation —
  * the shuffle carries at most 256 rows per batch regardless of batch
  * size), compared against a FIXED reference mixture captured from the
  * curated corpus, and each batch appends one (batch_id, n_tokens,
  * drift) row to the monitor sink.
  *
  * Scale posture: the reference histogram is a 256-element broadcast
  * local to each batch; per-batch state is NONE (drift is a per-batch
  * statistic, not a running aggregate), so the query is stateless and
  * restarts are trivially correct. Alerting is a downstream filter on
  * the drift column.
  */
object StreamingDrift {

  final case class Doc(doc_id: Long, text: String)

  /** 256-bucket hashed-token histogram of a static corpus, normalized —
    * the reference mixture a stream is judged against. Collected to a
    * driver array (256 doubles) once, at monitor construction. */
  def referenceMixture(docs: DataFrame): Array[Double] = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("int").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val hist = new Array[Double](256)
    var total = 0L
    counts.foreach { r => total += r.getLong(1) }
    counts.foreach { r => hist(r.getInt(0)) = r.getLong(1).toDouble / total }
    hist
  }

  /** Per-batch total-variation drift of the stream against `ref`,
    * appended to `outDir` as one row per micro-batch. Runs until the
    * AvailableNow drain completes. */
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
          Seq((batchId, total, drift))
            .toDF("batch_id", "n_tokens", "drift")
            .coalesce(1)
            .write.mode("append").parquet(outDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }
}
