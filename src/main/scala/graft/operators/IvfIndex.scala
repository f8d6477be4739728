package graft.operators

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k coarse centroids trained by Lloyd
  * iterations, every vector assigned to its nearest centroid, search
  * probes only the `nprobe` closest partitions and reranks exactly.
  *
  * Distributed shape mirrors MLlib k-means: assignment and per-dimension
  * sums are cluster-side aggregations (shuffle = k×dim partial sums, not
  * vectors); the k×dim centroid matrix itself updates driver-side and
  * broadcasts back as literals — it is tiny by construction.
  *
  * `nprobe = k` degrades to exact brute-force search (every partition
  * probed), which is the correctness anchor the spec asserts; smaller
  * nprobe trades recall for a 1/k-ish scan fraction. At 100 TB the
  * assignment column becomes the physical partition key so a probe reads
  * only its partitions' files.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    /** Centroid ids ranked by cosine to `q`, best first (driver-side —
      * k×dim floats). */
    def rank(q: Seq[Double]): Seq[Int] = {
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      centroids.indices
        .sortBy(c => (-cos(centroids(c).toSeq, q), c))
    }
  }

  private def centroidLit(m: Model): Column =
    typedlit(m.centroids.map(_.toSeq).toSeq)

  /** Nearest-centroid id for a vector column given the broadcast matrix.
    * The centroid matrix literal appears ONCE in the plan (inside the
    * transform lambda) — building k per-centroid expressions that each
    * embed `centroidLit` would serialize k copies of the whole k×dim
    * matrix into every assignment plan (O(k²·dim) literal payload per
    * Lloyd round). */
  private def nearest(vec: Column, m: Model): Column = {
    val sims = transform(sequence(lit(0), lit(m.k - 1)), c =>
      struct(cosineSim(vec, element_at(centroidLit(m), c + 1)).as("s"),
        c.cast("int").as("c")))
    element_at(array_sort(sims,
      (a, b) => when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1)
        .otherwise(a.getField("c") - b.getField("c"))), 1).getField("c")
  }

  /** Train k centroids with Lloyd iterations; init = the k lowest-id
    * vectors (deterministic seed). */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Model = {
    // nullable embedding column: a null among the k lowest-id seed rows
    // (or in the Lloyd pass) must not NPE the training job
    val nonNull = emb.filter(col(vecCol).isNotNull)
    val init = nonNull.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    var model = Model(init)
    val dims = init.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      // One partial+final aggregation per iteration via the typed
      // VectorAvg aggregator: shuffle = one dim-length buffer per
      // (partition, cluster), not one row per (vector, dimension).
      val means = nonNull.select(
          col(vecCol).cast("array<double>").as("v"),
          nearest(col(vecCol), model).as("cid"))
        .groupBy(col("cid"))
        .agg(graft.functions.VectorAvgAggregator.vectorAvg(dims, col("v")).as("mean"))
        .collect()
      val next = Array.tabulate(model.k)(c => model.centroids(c).clone())
      means.foreach { r =>
        next(r.getAs[Int]("cid")) = r.getSeq[Double](1).toArray
      }
      model = Model(next)
    }
    model
  }

  /** Index build: persistable (id, centroid_id) assignment. */
  def assign(emb: DataFrame, idCol: String, vecCol: String, m: Model): DataFrame =
    emb.select(col(idCol), col(vecCol), nearest(col(vecCol), m).as("centroid_id"))

  /** Probe the `nprobe` best partitions for `q`, exact rerank inside. */
  def search(assigned: DataFrame, idCol: String, vecCol: String, m: Model,
      q: Seq[Float], topK: Int, nprobe: Int): DataFrame = {
    val probes = m.rank(q.map(_.toDouble)).take(math.max(1, nprobe))
    assigned
      .filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol),
        cosineSim(col(vecCol), typedlit(q)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(topK)
  }
}
