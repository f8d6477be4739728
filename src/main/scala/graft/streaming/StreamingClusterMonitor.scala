package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming cluster-occupancy drift monitor: the semantic-SPACE dial
  * next to [[StreamingDrift]]'s token-mixture L1 and
  * [[StreamingEmbedDrift]]'s covariance Frobenius. Each micro-batch of
  * embeddings is assigned to a FIXED trained k-means model (the
  * embed_kmeans operator — broadcast flattened centroid matrix, the
  * codegen'd NearestCentroid argmin, exact integer arithmetic), its
  * per-cluster occupancy shares are compared against the TRAINING
  * assignment's shares, and one (batch_id, n_vecs, occ_l1) row lands in
  * the monitor sink per batch — L1 over the model's cluster ids, range
  * [0, 2], the report_drift convention.
  *
  * What it catches that the other two dials miss: a NEW SOURCE whose
  * documents pile into one semantic cluster moves occupancy long before
  * it moves global covariance (a few percent of mass relocating barely
  * nudges second moments) and never moves token stats if the vocabulary
  * overlaps. Cluster occupancy is the dial SemDeDup-style curation
  * actually budget-allocates by, so its drift is the one that
  * invalidates a sampling plan.
  *
  * Scale posture: per-batch state NONE (occupancy is a per-batch
  * statistic); the model broadcast is k·(d+1) longs; the per-batch
  * aggregation shuffles k counted rows; the driver fold is k shares in
  * sorted cluster order (deterministic double sum). Sink idempotent on
  * batch_id (dynamic partition overwrite) — at-least-once replay
  * overwrites the replayed batch's own row. Empty batches write no row.
  */
object StreamingClusterMonitor {

  /** The embeddings-stream element — ONE definition for every streaming
    * monitor (schema drift applied to one must reach the others). */
  type Emb = StreamingEmbedDrift.Emb
  val Emb: StreamingEmbedDrift.Emb.type = StreamingEmbedDrift.Emb

  /** Occupancy share per cluster id from a (cluster, ...) assignment
    * frame — the reference mixture a stream is judged against. */
  def referenceOccupancy(assigned: DataFrame): Map[Long, Double] = {
    val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("c"))
      .select(col("cluster"), col("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = counts.map(_._2).sum
    require(n > 0, "referenceOccupancy needs a non-empty assignment")
    counts.map { case (c, m) => c -> m.toDouble / n }.toMap
  }

  /** L1 occupancy drift of batch counts vs reference shares, folded in
    * sorted cluster-id order (deterministic). Clusters absent from the
    * batch contribute their full reference share; batch mass in a
    * cluster the reference never saw (impossible for a fixed model, but
    * kept total) contributes its full batch share. */
  private[graft] def occupancyL1(
      refShare: Map[Long, Double], counts: Map[Long, Long]): Double = {
    val n = counts.values.sum
    val ids = (refShare.keySet ++ counts.keySet).toSeq.sorted
    var s = 0.0
    ids.foreach { c =>
      val b = if (n == 0) 0.0 else counts.getOrElse(c, 0L).toDouble / n
      s += math.abs(b - refShare.getOrElse(c, 0.0))
    }
    s
  }

  /** Per-batch occupancy drift against the trained model, one row per
    * micro-batch to `outDir`. Runs until the AvailableNow drain completes. */
  def monitor(
      stream: Dataset[Emb],
      model: graft.operators.KmeansOps.Model,
      refShare: Map[Long, Double],
      dim: Int,
      outDir: String,
      checkpointDir: String): Unit = {
    stream.writeStream
      .foreachBatch { (batch: Dataset[Emb], batchId: Long) =>
        import batch.sparkSession.implicits._
        val q = batch.toDF()
          .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
          .select(graft.operators.KmeansOps.quantized(col("embedding")).as("qv"))
        // bounded: k counted rows leave the aggregation
        val counts = graft.operators.KmeansOps.assigned(q, model)
          .groupBy(col("cluster")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val n = counts.values.sum
        if (n > 0) {
          val l1 = occupancyL1(refShare, counts)
          Seq((batchId, n, l1))
            .toDF("batch_id", "n_vecs", "occ_l1")
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
