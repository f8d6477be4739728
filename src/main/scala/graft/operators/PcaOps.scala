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
  * Pipeline: quantize to exact 2²⁰ fixed point (the scale the
  * `embed_covariance` oracle pins; select_prototypes_scale uses a finer
  * 2²⁴ — the two contracts are deliberately separate) → ONE
  * `VectorOuterSumAggregator` pass (fixed-size mergeable partials,
  * order-independent integer sums) → covariance on the driver by the
  * same textbook formula the `embed_covariance` oracle pins → power
  * iteration with deflation for the top-k eigenpairs (deterministic:
  * fixed start-vector ladder, fixed iteration count, double arithmetic
  * on exact integer-derived inputs) → row-local projection with
  * broadcast-literal components (codegen'd zip_with/aggregate dot
  * products, no UDF).
  *
  * The eigen step itself is not ANSI-SQL-expressible, so `embed_pca` is
  * a rows-only registry entry; its exactness anchors are the
  * hash-checked `embed_covariance` row (pins the one distributed stage
  * bit-for-bit) and PcaSpec (recovers planted principal directions,
  * orthonormality, eigenvalue ordering, deterministic sign).
  */
object PcaOps {

  /** 2²⁰ fixed-point quantization scale — the contract the embed_covariance
    * DuckDB oracle pins (select_prototypes_scale quantizes at 2²⁴; the two
    * conventions are independent and must not be conflated). */
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
    * deflation. Deterministic: a fixed ladder of start vectors (all-ones,
    * then the basis vectors of the largest deflated diagonals), fixed
    * `iters`, sign fixed so the largest-magnitude entry is positive (ties
    * to the lowest index).
    *
    * Robustness (not just determinism): a single fixed start can be
    * (near-)orthogonal to the dominant eigenvector — e.g. a contrast
    * direction whose entries sum to ~0 is exactly orthogonal to all-ones,
    * and with a modest spectral gap `iters` rounds cannot amplify the
    * ~1e-16 rounding leakage to O(1). So each component (a) re-
    * orthogonalizes the iterate against the already-found components
    * every round (kills deflation rounding drift), and (b) is accepted
    * only if its Rayleigh residual ‖Av − λv‖ is small relative to the
    * matrix scale; otherwise the next start on the ladder is tried and
    * the smallest-residual candidate wins. */
  def topEigen(a: Array[Array[Double]], k: Int, iters: Int = 100)
      : (Array[Array[Double]], Array[Double]) = {
    val dim = a.length
    val m = a.map(_.clone())
    val comps = Array.ofDim[Double](k, dim)
    val vals = new Array[Double](k)
    // scale anchor for the residual tolerance: the largest |entry| of the
    // ORIGINAL matrix (deflation only shrinks the spectrum)
    var mscale = 0.0
    var mi = 0
    while (mi < dim) {
      var mj = 0
      while (mj < dim) {
        val x = math.abs(a(mi)(mj)); if (x > mscale) mscale = x; mj += 1
      }
      mi += 1
    }
    val tol = 1e-9 * math.max(mscale, java.lang.Double.MIN_NORMAL)

    def matVec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      w
    }

    // project out the components found so far (in place)
    def orthogonalize(v: Array[Double], c: Int): Unit = {
      var p = 0
      while (p < c) {
        val u = comps(p)
        var d = 0.0
        var i = 0
        while (i < dim) { d += u(i) * v(i); i += 1 }
        i = 0
        while (i < dim) { v(i) -= d * u(i); i += 1 }
        p += 1
      }
    }

    // one full power-iteration run from `start`; returns (v, lambda,
    // residual), or null when the start is degenerate (annihilated by the
    // orthogonalization — e.g. all-ones when a previous component IS the
    // all-ones direction; iterating on the cancellation noise would
    // "converge" to a zero vector whose residual is spuriously perfect)
    def run(start: Array[Double], c: Int): (Array[Double], Double, Double) = {
      var v = start.clone()
      orthogonalize(v, c)
      val n0 = math.sqrt(v.map(x => x * x).sum)
      if (n0 < 1e-12) return null
      var t0 = 0
      while (t0 < dim) { v(t0) /= n0; t0 += 1 }
      var it = 0
      while (it < iters) {
        val w = matVec(v)
        orthogonalize(w, c)
        val norm = math.sqrt(w.map(x => x * x).sum)
        // a (near-)annihilated iterate means the remaining spectrum is
        // ~zero; keep the current unit vector rather than dividing by 0
        if (norm > 1e-300) { var t = 0; while (t < dim) { w(t) /= norm; t += 1 }; v = w }
        it += 1
      }
      val av = matVec(v)
      var lambda = 0.0
      var i = 0
      while (i < dim) { lambda += v(i) * av(i); i += 1 }
      var r2 = 0.0
      i = 0
      while (i < dim) { val d = av(i) - lambda * v(i); r2 += d * d; i += 1 }
      (v, lambda, math.sqrt(r2))
    }

    var c = 0
    while (c < k) {
      // start ladder: all-ones, then basis vectors of the largest |diag|
      // entries of the current deflated matrix (deterministic order)
      val diagOrder = (0 until dim).sortBy(i => (-math.abs(m(i)(i)), i))
      val starts: Seq[Array[Double]] =
        Array.fill(dim)(1.0 / math.sqrt(dim.toDouble)) +:
          diagOrder.take(3).map { bi =>
            val e = new Array[Double](dim); e(bi) = 1.0; e
          }
      // run the WHOLE ladder: a small residual only certifies "an
      // eigenpair", not "the dominant one" — a start that happens to BE a
      // minor eigenvector converges to it with residual 0 (the all-ones /
      // contrast-direction trap). Among residual-acceptable candidates the
      // largest |λ| wins; if none is acceptable, the smallest residual.
      // Ladder and tie-breaks are fixed, so the solve stays deterministic.
      var best: (Array[Double], Double, Double) = null
      var bestOk = false
      var si = 0
      while (si < starts.length) {
        val cand = run(starts(si), c)
        if (cand != null) {
          val ok = cand._3 <= tol
          val better =
            if (best == null) true
            else if (ok != bestOk) ok
            else if (ok) math.abs(cand._2) > math.abs(best._2)
            else cand._3 < best._3
          if (better) { best = cand; bestOk = ok }
        }
        si += 1
      }
      require(best != null, s"topEigen: every start degenerated for component $c")
      val (v, lambda, _) = best
      // deterministic sign: largest-|entry| positive, ties to lowest index
      var bi = 0
      var i = 1
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
    * array&lt;float&gt; column; nulls are skipped by the aggregator, a
    * non-null vector of the wrong length throws (callers pre-filter on
    * `size(vec) === dim` if mixed lengths are expected — the oracle-parity
    * contract documented on `VectorOuterSumAggregator`). */
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
