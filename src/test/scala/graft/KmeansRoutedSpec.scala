package graft

import org.apache.spark.sql.functions._
import graft.operators.KmeansOps

/** Routed (two-level) assignment vs the exact brute argmin — the
  * IVF-style beyond-path for large k. On separated data the two must
  * agree EXACTLY; on arbitrary data routed can only lose at cell
  * boundaries, so its distance is bounded below by the exact one — an
  * invariant on ANY input — and the agreement rate on the real fixture
  * is pinned at the measured level. */
class KmeansRoutedSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def blobs(perBlob: Int, nBlobs: Int): Seq[(Long, Seq[Float])] =
    (0 until nBlobs * perBlob).map { i =>
      val blob = i % nBlobs
      val jitter = (i / nBlobs % 5 - 2) * 0.01
      val v = (0 until dim).map { d =>
        (if (d == blob % dim) 0.9 + jitter + 0.3 * (blob / dim) else 0.02 * jitter).toFloat
      }
      (i.toLong, v)
    }

  test("routed == exact on separated blobs; dist never better than exact anywhere") {
    val rows = blobs(20, 6)
    val df = rows.toDF("vec_id", "embedding")
    val (_, model) = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 6, rounds = 4)
    val q = df.select(col("vec_id"), KmeansOps.quantized(col("embedding")).as("qv"))
    val exact = KmeansOps.assigned(q, model)
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val routed = KmeansOps.assignedRouted(q, model)
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(routed.keySet == exact.keySet)
    routed.foreach { case (id, (c, d)) =>
      assert(exact(id) == ((c, d)), s"separated data must route exactly: vec $id")
    }
  }

  test("on the real fixture: routed dist >= exact dist always, high agreement, same schema") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
    val k = KmeansOps.adaptiveK(emb.count())
    val (_, model) = KmeansOps.fit(emb, "vec_id", "embedding", 64, k, rounds = 2)
    val q = emb.select(col("vec_id"), KmeansOps.quantized(col("embedding")).as("qv"))
    val exact = KmeansOps.assigned(q, model)
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val routed = KmeansOps.assignedRouted(q, model)
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(routed.keySet == exact.keySet)
    // the invariant: a routed result can never BEAT the exact minimum
    routed.foreach { case (id, (_, d)) =>
      assert(d >= exact(id)._2, s"routed dist beats exact for vec $id — impossible")
    }
    // measured 0.80 on this fixture: k = 8 is routing's WORST case (only
    // 3 coarse cells, so boundaries are coarse); the op exists for large
    // k, where cells shrink toward the true partition — the pin here is
    // a collapse tripwire, not the large-k operating point
    val agree = routed.count { case (id, (c, _)) => exact(id)._1 == c }
    assert(agree.toDouble / routed.size >= 0.75,
      s"agreement collapsed: $agree/${routed.size}")
  }

  test("fitRouted == fit end-to-end on separated blobs (training rounds route identically)") {
    val rows = blobs(20, 6)
    val df = rows.toDF("vec_id", "embedding")
    val brute = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 6, rounds = 4)._1
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)].collect().sortBy(_._1)
    val routed = KmeansOps.fitRouted(df, "vec_id", "embedding", dim, k = 6, rounds = 4)._1
      .select("vec_id", "cluster", "dist_q").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(routed.toSeq == brute.toSeq)
  }

  test("empty coarse cells are dropped: duplicate centroids cannot fabricate a cluster id") {
    // three identical fine centroids: localKmeans's first-k init makes
    // every coarse seed the same point, so all but one coarse cell empty
    // out — a routed query must still land on a REAL cluster id
    val c = Array.fill(4)(500000L)
    val model = KmeansOps.Model(Seq((7L, c), (9L, c.clone()), (11L, c.clone())))
    val q = Seq((1L, Seq(0.1f, 0.1f, 0.1f, 0.1f)), (2L, Seq(0.9f, 0.9f, 0.9f, 0.9f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), KmeansOps.quantized(col("embedding")).as("qv"))
    val got = KmeansOps.assignedRouted(q, model)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    got.values.foreach(cl => assert(Seq(7L, 9L, 11L).contains(cl),
      s"fabricated cluster id: $got"))
  }

  test("nearest_centroid throws on a model/vector dimension mismatch instead of truncating") {
    // a 64-dim model against 32-dim vectors used to read half-centroid
    // slices as phantom centroids and fabricate assignments silently
    val model = KmeansOps.Model(Seq((0L, Array.fill(3)(1L)), (1L, Array.fill(3)(5L))))
    val q = Seq((1L, Seq(0.1f, 0.2f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), KmeansOps.quantized(col("embedding")).as("qv"))
    val e = intercept[Exception](KmeansOps.assigned(q, model).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension mismatch between model and vectors")),
      s"got: ${msgs(e)}")
  }

  test("localKmeans: k clamped to point count, deterministic, empty-cell centroids persist") {
    val pts = Array(Array(0L, 0L), Array(100L, 0L), Array(0L, 100L))
    val (cents, assign) = KmeansOps.localKmeans(pts, k = 5, rounds = 3)
    assert(cents.length == 3 && assign.toSeq == Seq(0, 1, 2))
    val (c2, a2) = KmeansOps.localKmeans(pts, k = 5, rounds = 3)
    assert(c2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq && a2.toSeq == assign.toSeq)
  }
}
