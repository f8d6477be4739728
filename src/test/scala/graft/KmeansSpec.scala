package graft

import org.apache.spark.sql.functions._
import graft.operators.KmeansOps

/** Semantics of the exact fixed-point Lloyd operator that the DuckDB
  * hash rows (embed_kmeans / embed_kmeans_stats / select_cluster_balanced)
  * can't pin on planted geometry: separated clusters must be recovered
  * regardless of which ids seeded the init, Lloyd must strictly reduce
  * inertia on data where the init is bad, and the empty-cluster
  * degeneracy must keep ids stable. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Three well-separated blobs on distinct axes, members interleaved by
    * id so the first-k init lands all seeds in blob 0 — recovery must
    * come from the Lloyd update, not the init. */
  private def blobs(perBlob: Int): Seq[(Long, Seq[Float], Int)] =
    (0 until 3 * perBlob).map { i =>
      val blob = i % 3
      val jitter = (i / 3 % 5 - 2) * 0.01
      val v = (0 until dim).map { d =>
        (if (d == blob) 0.9 + jitter else 0.02 * jitter).toFloat
      }
      (i.toLong, v, blob)
    }

  test("separated blobs are recovered even when every init seed lands in one blob") {
    val rows = blobs(30)
    val df = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val (assignedDf, model) = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 3, rounds = 4)
    val got = assignedDf.select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // all members of a planted blob share one cluster id, and the three
    // blobs get three DISTINCT ids
    val byBlob = rows.groupBy(_._3).map { case (b, rs) =>
      val cs = rs.map(r => got(r._1)).distinct
      assert(cs.length == 1, s"blob $b split across clusters $cs")
      cs.head
    }
    assert(byBlob.toSet.size == 3, s"blobs collapsed: $byBlob")
    assert(model.centroids.nonEmpty && model.clusterIds == model.clusterIds.sorted)
  }

  test("Lloyd rounds strictly reduce inertia on badly-initialized data") {
    val rows = blobs(30)
    val df = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    def inertia(rounds: Int): Long =
      KmeansOps.fit(df, "vec_id", "embedding", dim, k = 3, rounds = rounds)._1
        .agg(sum(col("dist_q"))).collect()(0).getLong(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    val i4 = inertia(4)
    assert(i2 < i1, s"one update must improve a bad init: $i2 vs $i1")
    assert(i4 <= i2, s"further rounds must not regress: $i4 vs $i2")
  }

  test("empty-cluster degeneracy: duplicate seeds drop out, surviving ids stay stable") {
    // only two distinct locations but k = 4: at least two seeds coincide,
    // their clusters empty out after the first assignment (ties go to the
    // lowest id), and the final model must carry the surviving ids
    val rows = (0 until 40).map { i =>
      val v = (0 until dim).map(d => (if (d == i % 2) 1.0f else 0.0f))
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (assignedDf, model) = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 4, rounds = 3)
    val clusters = assignedDf.select("cluster").distinct().as[Long].collect().sorted
    assert(clusters.length == 2, s"two locations must survive as two clusters: ${clusters.toSeq}")
    assert(model.clusterIds == clusters.toSeq,
      s"model ids ${model.clusterIds} != assigned ids ${clusters.toSeq}")
    // determinism: a second fit reproduces the assignment exactly
    val again = KmeansOps.fit(df, "vec_id", "embedding", dim, k = 4, rounds = 3)._1
      .select("vec_id", "cluster").as[(Long, Long)].collect().sorted
    assert(again.toSeq == assignedDf.select("vec_id", "cluster")
      .as[(Long, Long)].collect().sorted.toSeq)
  }

  test("vector-sum aggregator: exact sums, nulls skipped, wrong length throws") {
    val ok = Seq((0L, Seq(1L, 2L)), (0L, null.asInstanceOf[Seq[Long]]), (1L, Seq(10L, -20L)))
      .toDF("g", "qv")
      .groupBy("g")
      .agg(graft.functions.VectorSumAggregator.vectorSum(2, col("qv")).as("o"))
      .select(col("g"), col("o.n"), col("o.sums")).orderBy("g").collect()
    assert(ok(0).getLong(1) == 1 && ok(0).getSeq[Long](2) == Seq(1L, 2L))
    assert(ok(1).getLong(1) == 1 && ok(1).getSeq[Long](2) == Seq(10L, -20L))
    val bad = Seq((0L, Seq(1L, 2L, 3L))).toDF("g", "qv")
      .agg(graft.functions.VectorSumAggregator.vectorSum(2, col("qv")).as("o"))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vector of length 3")), s"got: ${msgs(e)}")
  }

  test("floor-divided centroids match Math.floorDiv on negative sums") {
    // two vectors with negative coordinates whose sum is NOT an exact
    // multiple of n: the centroid must be the floor, not the truncation
    val df = Seq((0L, Seq(-0.3f, 0.3f)), (1L, Seq(-0.4f, 0.4f)))
      .toDF("vec_id", "embedding")
    val (_, model) = KmeansOps.fit(df, "vec_id", "embedding", dim = 2, k = 1, rounds = 2)
    val q = (x: Double) => math.floor(x * KmeansOps.Scale).toLong
    val expect = Array(
      Math.floorDiv(q(-0.3f.toDouble) + q(-0.4f.toDouble), 2L),
      Math.floorDiv(q(0.3f.toDouble) + q(0.4f.toDouble), 2L))
    assert(model.centroids.head._2.toSeq == expect.toSeq)
  }
}
