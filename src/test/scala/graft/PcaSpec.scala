package graft

import org.apache.spark.sql.functions._
import graft.operators.PcaOps

/** Exactness and recovery properties of the PCA family that the DuckDB
  * oracle can't express: the one-pass moment aggregation must equal a
  * naive two-pass covariance of the SAME quantized values bit-for-bit
  * (order-independence of the integer sums), and the power-iteration
  * eigen solve must recover planted principal directions with the
  * documented deterministic-sign convention. The distributed stage
  * itself is hash-anchored by the embed_covariance oracle row. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Planted rank-2 corpus: x = a·u + b·w with orthonormal u, w and
    * var(a) >> var(b) — the top component must recover ±u. */
  private def planted(n: Int): (Seq[(Long, Seq[Float])], Array[Double], Array[Double]) = {
    val u = Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0)
    val w = Array(0.0, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 0.5)
    val rows = (0 until n).map { i =>
      val a = (i % 21 - 10) * 0.1
      val b = ((i * 7) % 5 - 2) * 0.02
      val v = (0 until dim).map(d => (a * u(d) + b * w(d)).toFloat)
      (i.toLong, v)
    }
    (rows, u, w)
  }

  test("covarianceFromSums equals a naive two-pass covariance of the quantized values exactly") {
    val (rows, _, _) = planted(200)
    val df = rows.toDF("vec_id", "embedding")
    val m = PcaOps.train(df, "embedding", dim, k = 2)

    // naive driver-side reference over the same floor(x * 2^20) longs
    val q = rows.map(_._2.map(x => math.floor(x.toDouble * PcaOps.FixedPointScale).toLong))
    val n = q.length
    val sums = (0 until dim).map(d => q.map(_(d)).sum)
    val one = df
      .select(PcaOps.quantized(col("embedding")).as("qv"))
      .agg(graft.functions.VectorOuterSumAggregator.outerSums(dim, col("qv")).as("o"))
      .select(col("o.n"), col("o.sums"), col("o.prods")).collect()(0)
    assert(one.getLong(0) == n)
    assert(one.getSeq[Long](1) == sums)
    val prods = one.getSeq[Long](2)
    val cov = PcaOps.covarianceFromSums(dim, n, one.getSeq[Long](1), prods)
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      val sp = q.map(v => v(i) * v(j)).sum
      assert(prods(k) == sp, s"product sum ($i,$j)")
      val expect = (sp.toDouble - sums(i).toDouble * sums(j).toDouble / n) / (n - 1) /
        (PcaOps.FixedPointScale * PcaOps.FixedPointScale)
      // identical formula on identical exact inputs: bit-for-bit
      assert(cov(i)(j) == expect, s"cov ($i,$j)")
      k += 1
    }
    assert(m.n == n)
  }

  test("train recovers planted principal directions, ordered, orthonormal, sign-fixed") {
    val (rows, u, w) = planted(200)
    val df = rows.toDF("vec_id", "embedding")
    val m = PcaOps.train(df, "embedding", dim, k = 2)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // recovery: component 1 spans u, component 2 spans w (quantization
    // noise is ~2^-20 per element, far below the 1e-6 envelope)
    assert(math.abs(dot(m.components(0), u)) > 1 - 1e-6, "pc1 recovers u")
    assert(math.abs(dot(m.components(1), w)) > 1 - 1e-6, "pc2 recovers w")
    // eigenvalues ordered and matching the planted variances' order
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > 0)
    // orthonormal
    assert(math.abs(dot(m.components(0), m.components(0)) - 1) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-6)
    // deterministic sign: largest-|entry| entry is positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0, "sign convention")
    }
  }

  test("project equals the centered dot product, row-locally") {
    val (rows, _, _) = planted(60)
    val df = rows.toDF("vec_id", "embedding")
    val m = PcaOps.train(df, "embedding", dim, k = 2)
    val got = PcaOps.project(df, "vec_id", "embedding", m)
      .orderBy("vec_id").as[(Long, Double, Double)].collect()
    rows.zip(got).foreach { case ((id, v), (gid, p1, p2)) =>
      assert(id == gid)
      val c = v.map(_.toDouble).zip(m.mean).map { case (x, mu) => x - mu }
      val e1 = c.zip(m.components(0)).map { case (x, y) => x * y }.sum
      val e2 = c.zip(m.components(1)).map { case (x, y) => x * y }.sum
      assert(math.abs(p1 - e1) < 1e-9 && math.abs(p2 - e2) < 1e-9)
    }
  }

  test("embed_drift: identical snapshots read zero drift; a planted geometry shift surfaces its dimension") {
    val dir = tmpDir("pcadrift")
    // even/odd halves identical in distribution (same vectors re-idd):
    // every delta must be exactly 0 (both halves produce identical exact
    // integer sums, hence bit-identical covariance cells)
    val base = (0 until 40).map { i =>
      val a = (i % 7 - 3) * 0.1
      (0 until 8).map(d => (if (d == 0) a else a * 0.5 / (d + 1)).toFloat)
    }
    val same = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, v)) // same vector at even and odd ids
    }
    // dim-64 is what the registry query expects; tile the 8-dim pattern
    val same64 = same.map { case (id, v) => (id, Seq.fill(8)(v).flatten) }
    same64.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val zero = SparkEntry.queries("embed_drift")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(zero.length == 10)
    zero.foreach { case (_, _, ca, cb, d) => assert(d == 0.0 && ca == cb) }

    // now shift the odd half's dimension 0 variance up: the top drift
    // cell must be (0, 0)
    val shifted = same64.map { case (id, v) =>
      if (id % 2 == 1) (id, v.updated(0, v(0) * 3f)) else (id, v)
    }
    shifted.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = SparkEntry.queries("embed_drift")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(top._1 == 0L && top._2 == 0L, s"top drift cell should be (0,0), got $top")
    assert(top._5 < 0.0, "odd half has larger var(0), so cov_a - cov_b < 0")
  }

  test("whiten: output covariance is the identity; zero-variance components are dropped") {
    val (rows, _, _) = planted(200)
    val df = rows.toDF("vec_id", "embedding")
    val m = PcaOps.train(df, "embedding", dim, k = 2)
    val w = PcaOps.whiten(df, "vec_id", "embedding", m)
      .as[(Long, Double, Double)].collect()
    val n = w.length
    val (m1, m2) = (w.map(_._2).sum / n, w.map(_._3).sum / n)
    val v1 = w.map(r => (r._2 - m1) * (r._2 - m1)).sum / (n - 1)
    val v2 = w.map(r => (r._3 - m2) * (r._3 - m2)).sum / (n - 1)
    val cv = w.map(r => (r._2 - m1) * (r._3 - m2)).sum / (n - 1)
    // unit variance on both axes, zero cross-covariance: one assertion
    // that catches a wrong eigenvalue, wrong scale, or skewed basis.
    // Tolerance 1e-4: the model's eigenvalues come from the 2^20
    // fixed-point covariance while the whitened output is computed from
    // the raw floats, so the two disagree at the quantization level
    // (measured ~1e-5 relative here) — far below any real defect.
    assert(math.abs(v1 - 1.0) < 1e-4, s"var(w1) = $v1")
    assert(math.abs(v2 - 1.0) < 1e-4, s"var(w2) = $v2")
    assert(math.abs(cv) < 1e-4, s"cov(w1,w2) = $cv")
    // a k beyond the data's rank: the ~zero-eigenvalue component must be
    // dropped, not divided by ~0 into amplified float noise
    val m4 = PcaOps.train(df, "embedding", dim, k = 4)
    val cols = PcaOps.whiten(df, "vec_id", "embedding", m4, minVariance = 1e-9).columns
    assert(cols.length == 3, s"rank-2 data must whiten to 2 components, got ${cols.toSeq}")
  }

  test("embed_jl_project: bit-exact vs a pure-Scala reference; planted pairwise-distance distortion bounded") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
      .filter($"embedding".isNotNull && size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1).take(20).toMap
    def sign(j: Int, i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${100 + j}|$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 1) 1.0 else -1.0
    }
    def refProj(v: Seq[Float]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += v(i).toDouble * sign(j, i); i += 1 }
        acc / 4.0
      }
    val got = SparkEntry.queries("embed_jl_project")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    emb.foreach { case (id, v) =>
      val expect = refProj(v)
      val g = got(id)
      assert(g.length == 16)
      // identical sequential double fold: bit-for-bit
      (0 until 16).foreach(j => assert(g(j) == expect(j), s"vec $id dim $j"))
    }
    // distortion envelope on the fixture's own pairs: JL with k=16 is a
    // coarse sketch, but squared distances should stay within a generous
    // constant factor for the measured (deterministic) sign matrix
    val ids = emb.keys.toSeq.sorted.take(8)
    for (a <- ids; b <- ids if a < b) {
      val d0 = emb(a).zip(emb(b)).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      val d1 = got(a).zip(got(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if (d0 > 1e-12) {
        val ratio = d1 / d0
        assert(ratio > 0.1 && ratio < 4.0,
          s"JL distortion out of envelope for ($a,$b): $ratio")
      }
    }
  }

  test("topEigen recovers a dominant contrast direction orthogonal to the all-ones start") {
    // v1 = (1,-1,0,...)/sqrt(2) sums to 0 — EXACTLY orthogonal to the
    // all-ones start — with a modest 5-vs-4 spectral gap: (5/4)^100
    // amplifies the ~1e-16 rounding leakage only to ~5e-7, so a single
    // all-ones start silently returns the SECOND eigenvector as pc1.
    // The residual-checked start ladder must recover the true order.
    val d = 8
    val v1 = Array.tabulate(d)(i => if (i == 0) 1.0 else if (i == 1) -1.0 else 0.0)
      .map(_ / math.sqrt(2.0))
    val v2 = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    val a = Array.tabulate(d, d)((i, j) => 5.0 * v1(i) * v1(j) + 4.0 * v2(i) * v2(j))
    val (comps, vals) = PcaOps.topEigen(a, k = 2)
    def dot(x: Array[Double], y: Array[Double]): Double =
      x.zip(y).map { case (p, q) => p * q }.sum
    assert(math.abs(vals(0) - 5.0) < 1e-9 && math.abs(vals(1) - 4.0) < 1e-9,
      s"eigenvalues must come back ordered (5, 4), got ${vals.toSeq}")
    assert(math.abs(dot(comps(0), v1)) > 1 - 1e-9, "pc1 must be the contrast direction")
    assert(math.abs(dot(comps(1), v2)) > 1 - 1e-9, "pc2 must be the all-ones direction")
    // Rayleigh residuals near zero — the acceptance criterion itself
    for (c <- 0 until 2) {
      val av = a.map(row => dot(row, comps(c)))
      val r = math.sqrt(av.zip(comps(c)).map { case (x, v) => val e = x - vals(c) * v; e * e }.sum)
      assert(r < 1e-8, s"residual for component $c: $r")
    }
  }

  test("outer-sum aggregator: nulls skipped, wrong-length vectors throw, not silently dropped") {
    val ok = Seq((1L, Seq(1L, 2L, 3L)), (2L, null.asInstanceOf[Seq[Long]]), (3L, Seq(4L, 5L, 6L)))
      .toDF("id", "qv")
      .agg(graft.functions.VectorOuterSumAggregator.outerSums(3, col("qv")).as("o"))
      .select(col("o.n"), col("o.sums")).collect()(0)
    assert(ok.getLong(0) == 2 && ok.getSeq[Long](1) == Seq(5L, 7L, 9L))
    val bad = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L)))
      .toDF("id", "qv")
      .agg(graft.functions.VectorOuterSumAggregator.outerSums(3, col("qv")).as("o"))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vector of length 2")), s"got: ${msgs(e)}")
  }

  test("embed_covariance registry row: full upper triangle, PSD-consistent cells") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("embed_covariance")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 64 * 65 / 2)
    val cells = got.map { case (i, j, c) => (i, j) -> c }.toMap
    (0 until 64).foreach(i => assert(cells((i.toLong, i.toLong)) >= 0.0, s"var($i)"))
    // Cauchy–Schwarz on the exact sample covariance: cov(i,j)^2 <= var_i var_j
    got.foreach { case (i, j, c) =>
      val bound = cells((i, i)) * cells((j, j))
      assert(c * c <= bound * (1 + 1e-12) + 1e-300, s"CS at ($i,$j)")
    }
  }
}
