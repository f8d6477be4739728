package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column, built for exact
  * cross-engine reproducibility: every arithmetic step is integer-only in
  * a 2²⁴ fixed-point space, so the full clustering — init, every
  * assignment, every centroid update — hash-matches a DuckDB oracle that
  * unrolls the same rounds as CTEs. The training-data uses: cluster-
  * balanced corpus selection (sample evenly across semantic clusters, the
  * DataComp/SemDeDup recipe), cluster-level dedup blocking, and per-
  * cluster quality auditing.
  *
  * Determinism contract (every choice is portable ANSI SQL):
  *  - quantize: q = floor(x·2²⁴) per dimension — exact longs both engines;
  *  - init: the quantized vectors of the k smallest vec_ids (a bounded
  *    TakeOrdered driver boundary, k·d longs — at 100 TB you would seed
  *    from a sample, which is one extra deterministic filter);
  *  - assignment: argmin over squared L2 in quantized space (|Δq|² ≤ 2⁵⁰,
  *    64 dims ⇒ ≤ 2⁵⁶ — exact in a long), ties to the lowest cluster id;
  *  - update: per-cluster per-dimension floor-divided integer mean
  *    (Math.floorDiv here == `(s - ((s%n)+n)%n) // n` in DuckDB — exact
  *    multiple, so floor and truncate agree);
  *  - a cluster that loses all members drops out (standard Lloyd
  *    degeneracy), and both engines drop it identically.
  *
  * Scale shape per round: assignment is ROW-LOCAL (k·d codegen'd integer
  * ops per row against a ONE-ROW broadcast of the centroid matrix — no
  * shuffle of corpus rows); the update is `groupBy(cluster)` over a fixed-size
  * [[graft.functions.VectorSumAggregator]] buffer (k·partitions buffers
  * shuffled, NOT n·d exploded rows); the driver sees k·(d+1) longs per
  * round. Rounds are a fixed small constant — the standard curation
  * pipelines run 2–10 Lloyd rounds on a sample, then one assignment pass
  * over the corpus.
  */
object KmeansOps {

  /** 2²⁴ fixed-point scale (the select_prototypes_scale convention — fine
    * enough that quantization error ~6e-8 per element is far below any
    * cluster-boundary resolution, coarse enough that squared distances
    * stay exact in longs at d = 64). */
  val Scale = 16777216.0

  /** Quantized view of a float-vector column: floor(x·2²⁴) as long. */
  def quantized(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale)).cast("long"))

  /** Surviving centroids, ordered by cluster id (ids are stable across
    * rounds even when a cluster empties out and drops). */
  final case class Model(centroids: Seq[(Long, Array[Long])]) {
    def clusterIds: Seq[Long] = centroids.map(_._1)
  }

  /** Adds `cluster` (argmin centroid, ties to the lowest id) and `dist_q`
    * (exact squared distance to it) to a frame with a `qv` column.
    *
    * The centroid table rides a ONE-ROW broadcast join (surviving ids +
    * the flattened k×d long matrix as DATA — k literal expressions would
    * blow the plan tree up at the adaptive-k sizes dedup blocking needs,
    * ~3k centroids at the 100× fixture), and the per-row argmin is the
    * codegen'd allocation-free loop of
    * [[graft.functions.NearestCentroidExpression]] (a transform/zip_with
    * chain allocates k·d longs of garbage per row and measured as the
    * whole operator at k ≈ 3000). Exact integer arithmetic, first-minimum
    * tie-break — the `ORDER BY d, c` oracle rule. */
  def assigned(df: DataFrame, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(model.centroids.nonEmpty, "assigned: empty model")
    val d = model.centroids.head._2.length
    val centRow = Seq((model.clusterIds, model.centroids.flatMap(_._2.toSeq)))
      .toDF("cids", "cflat")
    df.crossJoin(broadcast(centRow))
      .withColumn("nc",
        graft.functions.NearestCentroidExpression.nearestCentroid(col("qv"), col("cflat"), d))
      .withColumn("dist_q", col("nc.dist"))
      .withColumn("cluster", element_at(col("cids"), col("nc.idx") + 1))
      .drop("nc", "cids", "cflat")
  }

  /** Driver-local Lloyd k-means over a SMALL point set (the coarse rung of
    * routed assignment: the points are the k fine centroids, k ≤ ~10⁵, so
    * the O(points·k'·d·rounds) loop is a driver detail). Same determinism
    * rules as the distributed operator: first-k init in input order,
    * first-minimum assignment, floor-divided integer centroid updates. */
  private[graft] def localKmeans(points: Array[Array[Long]], k: Int, rounds: Int)
      : (Array[Array[Long]], Array[Int]) = {
    require(points.nonEmpty && k >= 1 && rounds >= 1)
    val kk = math.min(k, points.length)
    var cents = points.take(kk).map(_.clone())
    var assign = new Array[Int](points.length)
    def assignAll(): Unit = {
      var i = 0
      while (i < points.length) {
        var best = 0
        var bestD = Long.MaxValue
        var j = 0
        while (j < cents.length) {
          var s = 0L
          var t = 0
          val p = points(i); val c = cents(j)
          while (t < p.length) { val d = p(t) - c(t); s += d * d; t += 1 }
          if (s < bestD) { bestD = s; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
    }
    var r = 1
    assignAll()
    while (r < rounds) {
      // floor-divided integer means; empty cells keep their old centroid
      val dim = points(0).length
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < points.length) {
        val a = assign(i); val p = points(i)
        var t = 0
        while (t < dim) { sums(a)(t) += p(t); t += 1 }
        counts(a) += 1
        i += 1
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old
        else sums(j).map(s => Math.floorDiv(s, counts(j)))
      }
      assignAll()
      r += 1
    }
    (cents, assign)
  }

  /** Routed (IVF-style two-level) assignment — the beyond-brute path for
    * LARGE k: cluster the k fine centroids into k' = ceil(√k) coarse
    * cells driver-side, then each row does TWO NearestCentroid argmins —
    * coarse (k'·d ops) and fine within its cell (~k/k'·d ops) — instead
    * of one k·d brute scan: ~2√k·d per row, a 28× op cut at k ≈ 3000.
    * APPROXIMATE at cell boundaries (a vector whose true centroid lives
    * in a neighboring cell gets that cell's best); `assigned` is the
    * exact twin, and the spec pins routed == exact on separated data.
    * All structures ride ONE broadcast row as data (nested arrays):
    * coarse matrix + per-cell flattened member matrices + member ids. */
  def assignedRouted(df: DataFrame, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fine = model.centroids.map(_._2).toArray
    require(fine.nonEmpty, "assignedRouted: empty model")
    val kPrime = math.max(1, math.ceil(math.sqrt(fine.length.toDouble)).toInt)
    val (coarse, route) = localKmeans(fine, kPrime, rounds = 3)
    // EMPTY cells (no fine centroid mapped to them) are dropped from the
    // broadcast outright: a query vector nearest to an empty cell's coarse
    // centroid would otherwise route into a cell with no real members and
    // come back with a fabricated cluster id
    val byCell = (0 until coarse.length).flatMap { c =>
      val members = route.zipWithIndex.filter(_._1 == c).map(_._2)
      if (members.isEmpty) None
      else Some((coarse(c).toSeq,
        members.map(m => model.centroids(m)._1).toSeq,
        members.flatMap(m => fine(m).toSeq).toSeq))
    }
    val row = (byCell.flatMap(_._1), byCell.map(_._2), byCell.map(_._3))
    val centRow = Seq(row).toDF("coarse_flat", "cell_ids", "cell_flats")
    import graft.functions.NearestCentroidExpression.nearestCentroid
    val d = fine(0).length
    df.crossJoin(broadcast(centRow))
      .withColumn("cell",
        nearestCentroid(col("qv"), col("coarse_flat"), d).getField("idx") + 1)
      .withColumn("nc",
        nearestCentroid(col("qv"), element_at(col("cell_flats"), col("cell")), d))
      .withColumn("dist_q", col("nc.dist"))
      .withColumn("cluster",
        element_at(element_at(col("cell_ids"), col("cell")), col("nc.idx") + 1))
      .drop("nc", "cell", "coarse_flat", "cell_ids", "cell_flats")
  }

  /** One centroid update: per-cluster exact long sums via the fixed-size
    * aggregator, floor-divided on the driver (k·(d+1) longs — a bounded
    * driver boundary of the IvfIndex-centroid kind). */
  private def updated(assignedDf: DataFrame, dim: Int): Model = {
    import graft.functions.VectorSumAggregator
    val rows = assignedDf
      .groupBy(col("cluster"))
      .agg(VectorSumAggregator.vectorSum(dim, col("qv")).as("o"))
      .select(col("cluster"), col("o.n"), col("o.sums"))
      .collect()
    val cents = rows.map { r =>
      val n = r.getLong(1)
      val sums = r.getSeq[Long](2)
      (r.getLong(0), sums.map(s => Math.floorDiv(s, n)).toArray)
    }
    Model(cents.sortBy(_._1).toSeq)
  }

  /** Occupancy-targeted cluster count: ceil(n / target) — the
    * adaptive-planes argument applied to Lloyd blocking. A FIXED k makes
    * within-cluster candidate pairs O(n²/k) (measured: 250k pairs at 2k
    * vectors but 2.5e9 at 200k with k = 8); k = ceil(n/target) bounds
    * them at O(n·target) — linear — at the price of an O(n·k·d)
    * assignment scan, the same trade SemDeDup's reference implementation
    * makes (50k faiss clusters at 1.7B docs). */
  def adaptiveK(n: Long, targetOccupancy: Long = 64L): Int =
    math.max(1L, (n + targetOccupancy - 1) / targetOccupancy).toInt

  /** Deterministic init: the quantized vectors of the k smallest vec_ids. */
  def init(df: DataFrame, idCol: String, k: Int): Model = {
    val rows = df.orderBy(col(idCol)).limit(k)
      .select(col("qv")).collect()
    Model(rows.zipWithIndex.map { case (r, i) =>
      (i.toLong, r.getSeq[Long](0).toArray)
    }.toSeq)
  }

  /** `rounds` assignment passes (centroids update after every pass but
    * the last); returns the final assigned frame — (idCol, cluster,
    * dist_q) — and the model that produced it. `df(vecCol)` must be
    * non-null, length-`dim` vectors (callers filter — the aggregator
    * throws on violations rather than diverging from the oracle). */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      rounds: Int): (DataFrame, Model) =
    fitWith(df, idCol, vecCol, dim, k, rounds, assigned)

  /** `fit` with ROUTED assignment inside the training rounds too — the
    * whole Lloyd loop at O(n·√k·d) per round instead of O(n·k·d), which
    * is what makes large-k training feasible at all (k = 31k at the
    * 1000× fixture would cost minutes PER BRUTE PASS). Approximate at
    * cell boundaries exactly like `assignedRouted` (identical on
    * separated data — KmeansRoutedSpec); the oracle-checked queries stay
    * on the brute `fit`. */
  def fitRouted(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      rounds: Int): (DataFrame, Model) =
    fitWith(df, idCol, vecCol, dim, k, rounds, assignedRouted)

  private def fitWith(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, rounds: Int,
      assignFn: (DataFrame, Model) => DataFrame): (DataFrame, Model) = {
    require(rounds >= 1, s"kmeans needs at least one assignment round, got $rounds")
    require(k >= 1, s"kmeans needs at least one cluster, got $k")
    val q = df.select(col(idCol), quantized(col(vecCol)).as("qv")).persist()
    var model = init(q, idCol, k)
    var r = 1
    while (r < rounds) {
      model = updated(assignFn(q, model), dim)
      r += 1
    }
    (assignFn(q, model).select(col(idCol), col("cluster"), col("dist_q")), model)
  }
}
