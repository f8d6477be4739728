package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming embedding-geometry drift monitor: the unbounded-stream twin
  * of the batch `embed_drift` query, and the covariance-space companion
  * of [[StreamingDrift]]'s token-mixture monitor. Each micro-batch of
  * embeddings is reduced to ONE exact second-moment buffer (the
  * `VectorOuterSumAggregator` — a single row leaves the per-batch
  * aggregation regardless of batch size), its covariance cells are
  * compared against a FIXED reference covariance captured from the
  * curated corpus, and one (batch_id, n_vecs, frob_drift) row lands in
  * the monitor sink per batch.
  *
  * Why a second monitor: token drift catches vocabulary shifts;
  * covariance drift catches GEOMETRY shifts — a swapped embedding model,
  * a quietly changed normalization, a domain-mix move — that leave token
  * statistics untouched. A 100 TB ingest pipeline wants both dials.
  *
  * Scale posture mirrors StreamingDrift: the reference is a
  * d(d+1)/2-double broadcast; per-batch state is NONE (drift is a
  * per-batch statistic); the shuffle carries one fixed-size moment
  * buffer; the sink is idempotent on batch_id (dynamic-partition
  * overwrite), so foreachBatch's at-least-once replay overwrites the
  * replayed batch's own row instead of duplicating it. A batch with
  * fewer than 2 usable vectors has no covariance and writes no row.
  */
object StreamingEmbedDrift {

  final case class Emb(vec_id: Long, embedding: Seq[Float])

  /** Upper-triangular covariance cells (row-major, j ≥ i) of a static
    * embeddings DataFrame — the reference geometry a stream is judged
    * against. One aggregation job; requires at least 2 non-null vectors. */
  def referenceCovariance(embs: DataFrame, dim: Int): Array[Double] = {
    import graft.functions.VectorOuterSumAggregator
    // size filter: the aggregator THROWS on a wrong-length non-null vector
    // (oracle-parity contract); the reference builder skips them instead,
    // mirroring the embed_covariance registry filter
    val row = embs.filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(graft.operators.PcaOps.quantized(col("embedding")).as("qv"))
      .agg(VectorOuterSumAggregator.outerSums(dim, col("qv")).as("o"))
      .select(col("o.n"), col("o.sums"), col("o.prods"))
      .collect()(0)
    covCells(dim, row.getLong(0), row.getSeq[Long](1), row.getSeq[Long](2))
  }

  private def covCells(dim: Int, n: Long, sums: Seq[Long], prods: Seq[Long]): Array[Double] = {
    require(n >= 2, s"covariance needs at least 2 vectors, got $n")
    val scale2 = graft.operators.PcaOps.FixedPointScale * graft.operators.PcaOps.FixedPointScale
    val cells = new Array[Double](dim * (dim + 1) / 2)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cells(k) = (prods(k).toDouble - sums(i).toDouble * sums(j).toDouble / n) /
          (n - 1) / scale2
        k += 1; j += 1
      }
      i += 1
    }
    cells
  }

  /** Frobenius distance ‖cov_batch − cov_ref‖_F from upper-triangular
    * cells: off-diagonal squared differences count twice (the full
    * symmetric matrix), diagonal once. */
  private[streaming] def frobenius(dim: Int, a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val d = a(k) - b(k)
        s += (if (i == j) d * d else 2.0 * d * d)
        k += 1; j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** Per-batch Frobenius covariance drift against `refCells`, one row per
    * micro-batch to `outDir`. Runs until the AvailableNow drain completes. */
  def monitor(
      stream: Dataset[Emb],
      refCells: Array[Double],
      dim: Int,
      outDir: String,
      checkpointDir: String): Unit = {
    val spark = stream.sparkSession
    val refBc = spark.sparkContext.broadcast(refCells)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Emb], batchId: Long) =>
        import batch.sparkSession.implicits._
        import graft.functions.VectorOuterSumAggregator
        // bounded: exactly one moment-buffer row leaves the aggregation.
        // The size filter keeps one malformed vector in a batch from
        // crashing the whole monitor (the aggregator throws on length
        // mismatch by contract)
        val row = batch.toDF()
          .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
          .select(graft.operators.PcaOps.quantized(col("embedding")).as("qv"))
          .agg(VectorOuterSumAggregator.outerSums(dim, col("qv")).as("o"))
          .select(col("o.n"), col("o.sums"), col("o.prods"))
          .collect()(0)
        val n = row.getLong(0)
        if (n >= 2L) {
          val cells = covCells(dim, n, row.getSeq[Long](1), row.getSeq[Long](2))
          val drift = frobenius(dim, cells, refBc.value)
          // idempotent on batch_id: a replayed batch overwrites its own
          // partition (dynamic mode leaves every other batch's intact)
          Seq((batchId, n, drift))
            .toDF("batch_id", "n_vecs", "frob_drift")
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
