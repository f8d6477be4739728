package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the big-n-small-d linear
  * algebra shape (n rows stay on executors, only a d(d+1)/2-cell exact
  * second-moment buffer reaches the driver; the d×d eigen solve is a
  * driver-local O(d²·iters) detail). The training-data uses: embedding
  * whitening before SemDeDup-style clustering, dimensionality reduction
  * ahead of ANN indexing, and corpus drift diagnostics (how much variance
  * the top components explain, and whether it moves between snapshots).
  *
  * Pipeline: quantize to exact 2²⁰ fixed point (the
  * select_prototypes_scale convention) → ONE `VectorOuterSumAggregator`
  * pass (fixed-size mergeable partials, order-independent integer sums)
  * → covariance on the driver by the same textbook formula the
  * `embed_covariance` oracle pins → power iteration with deflation for
  * the top-k eigenpairs (deterministic: fixed start vector, fixed
  * iteration count, double arithmetic on exact integer-derived inputs)
  * → row-local projection with broadcast-literal components (codegen'd
  * zip_with/aggregate dot products, no UDF).
  *
  * The eigen step itself is not ANSI-SQL-expressible, so `embed_pca` is
  * a rows-only registry entry; its exactness anchors are the
  * hash-checked `embed_covariance` row (pins the one distributed stage
  * bit-for-bit) and PcaSpec (recovers planted principal directions,
  * orthonormality, eigenvalue ordering, deterministic sign).
  */
object PcaOps {

  /** 2²⁰ fixed-point quantization scale shared with the covariance oracle. */
  val FixedPointScale = 1048576.0

  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Quantized view of a float-vector column: floor(x·2²⁰) as long. */
  def quantized(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(FixedPointScale)).cast("long"))

  /** Sample covariance from the aggregator's exact sums — written as the
    * identical double expression the embed_covariance DuckDB oracle uses,
    * so both paths produce bit-identical cells. */
  def covarianceFromSums(
      dim: Int, n: Long, sums: Seq[Long], prods: Seq[Long]): Array[Array[Double]] = {
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    val c = Array.ofDim[Double](dim, dim)
    val scale2 = FixedPointScale * FixedPointScale
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov =
          (prods(k).toDouble - sums(i).toDouble * sums(j).toDouble / n) / (n - 1) / scale2
        c(i)(j) = cov
        c(j)(i) = cov
        k += 1
        j += 1
      }
      i += 1
    }
    c
  }

  /** Top-k eigenpairs of a symmetric matrix by power iteration with
    * deflation. Deterministic: fixed all-ones start, fixed `iters`,
    * sign fixed so the largest-magnitude entry is positive (ties to the
    * lowest index). */
  def topEigen(a: Array[Array[Double]], k: Int, iters: Int = 100)
      : (Array[Array[Double]], Array[Double]) = {
    val dim = a.length
    val m = a.map(_.clone())
    val comps = Array.ofDim[Double](k, dim)
    val vals = new Array[Double](k)
    var c = 0
    while (c < k) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var it = 0
      while (it < iters) {
        val w = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var s = 0.0
          var j = 0
          while (j < dim) { s += m(i)(j) * v(j); j += 1 }
          w(i) = s
          i += 1
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        // a (near-)annihilated iterate means the remaining spectrum is
        // ~zero; keep the current unit vector rather than dividing by 0
        if (norm > 1e-300) { var t = 0; while (t < dim) { w(t) /= norm; t += 1 }; v = w }
        it += 1
      }
      // Rayleigh quotient on the deflated matrix = the eigenvalue
      var lambda = 0.0
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        lambda += v(i) * s
        i += 1
      }
      // deterministic sign: largest-|entry| positive, ties to lowest index
      var bi = 0
      i = 1
      while (i < dim) { if (math.abs(v(i)) > math.abs(v(bi))) bi = i; i += 1 }
      if (v(bi) < 0) { var t = 0; while (t < dim) { v(t) = -v(t); t += 1 } }
      comps(c) = v
      vals(c) = lambda
      // deflate: m -= lambda v vt
      i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { m(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    (comps, vals)
  }

  /** ONE distributed aggregation + driver eigen solve. `df(vecCol)` is an
    * array&lt;float&gt; column; null/short vectors are skipped by the
    * aggregator (callers filter if they need strictness). */
  def train(df: DataFrame, vecCol: String, dim: Int, k: Int, iters: Int = 100): PcaModel = {
    import graft.functions.VectorOuterSumAggregator
    // 1-row driver boundary (the IvfIndex-centroid kind): the collected
    // value is the fixed-size moment buffer, never corpus rows
    val row = df
      .select(quantized(col(vecCol)).as("qv"))
      .agg(VectorOuterSumAggregator.outerSums(dim, col("qv")).as("o"))
      .select(col("o.n"), col("o.sums"), col("o.prods"))
      .collect()(0)
    val n = row.getLong(0)
    val sums = row.getSeq[Long](1)
    val prods = row.getSeq[Long](2)
    val cov = covarianceFromSums(dim, n, sums, prods)
    val (comps, vals) = topEigen(cov, k, iters)
    val mean = sums.map(_.toDouble / n / FixedPointScale).toArray
    PcaModel(n, mean, comps, vals)
  }

  /** Row-local projection of each vector onto the model's components:
    * pc_c = x·v_c − mean·v_c (the centered dot, expanded so the hot loop
    * is ONE codegen'd zip_with/aggregate per component over the row's
    * own array — the broadcast is literal, no join, no UDF). */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame = {
    val pcs = model.components.zipWithIndex.map { case (comp, ci) =>
      val lits = array(comp.map(lit): _*)
      val meanDot = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      (aggregate(
        zip_with(col(vecCol).cast("array<double>"), lits, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) - lit(meanDot)).as(s"pc${ci + 1}")
    }
    df.select(col(idCol) +: pcs: _*)
  }

  /** PCA whitening: the projection with each component divided by the
    * square root of its eigenvalue, so the output coordinates have unit
    * variance and zero cross-covariance (the standard normalization
    * before distance-threshold clustering — SemDeDup-style semantic
    * dedup — or Mahalanobis-flavored outlier scoring). Still entirely
    * row-local: the 1/√λ scale folds into the same broadcast-literal
    * component arrays. Components whose eigenvalue is ≤ `minVariance`
    * carry no signal to normalize (dividing by ~0 would amplify float
    * noise unboundedly) and are dropped, matching scikit-learn's
    * whiten-with-rank-truncation behavior. */
  def whiten(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      minVariance: Double = 1e-12): DataFrame = {
    val kept = model.components.zip(model.eigenvalues)
      .filter { case (_, ev) => ev > minVariance }
    require(kept.nonEmpty,
      "whiten: every component is below the variance floor — nothing to normalize")
    val pcs = kept.zipWithIndex.map { case ((comp, ev), ci) =>
      val inv = 1.0 / math.sqrt(ev)
      val lits = array(comp.map(c => lit(c * inv)): _*)
      val meanDot = comp.zip(model.mean).map { case (c, m) => c * m }.sum * inv
      (aggregate(
        zip_with(col(vecCol).cast("array<double>"), lits, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) - lit(meanDot)).as(s"w${ci + 1}")
    }
    df.select(col(idCol) +: pcs: _*)
  }
}
