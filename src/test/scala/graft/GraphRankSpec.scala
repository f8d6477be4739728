package graft

import graft.operators.GraphRank
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference of the fixed-point power iteration: same floor
    * arithmetic as GraphRank.powerIteration, computed single-threaded. */
  private def refRank(
      edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = outdeg.size.toLong
    val rInit = scale / n
    val base = (15L * rInit) / 100L
    var r: Map[Long, Long] = outdeg.map { case (id, _) => id -> rInit }
    for (_ <- 1 to iters) {
      val incoming = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = incoming.map { case (id, m) => id -> (base + (85L * m) / 100L) }
    }
    r
  }

  // path graph 1–2–3 plus a triangle 4–5–6, symmetrized
  private val und = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
  private val sym = und ++ und.map(_.swap)

  test("matches the scalar fixed-point reference on a hand graph") {
    val got = GraphRank.powerIteration(sym.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    val want = refRank(sym, 5)
    assert(got == want)
    // centre of the path outranks its endpoints; triangle is symmetric
    assert(got(2L) > got(1L) && got(1L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
  }

  test("graph_lpa_communities: cliques converge to their min label; bridged tie resolves to the smaller label") {
    // two triangles {1,2,3} and {7,8,9} bridged by order {3,7}: each
    // clique converges to its min label; the scalar replay below pins the
    // exact 3-round synchronous outcome including the bridge vertices
    val orders = Seq(10L -> Seq(1L, 2L, 3L), 20L -> Seq(7L, 8L, 9L),
      30L -> Seq(3L, 7L))
    val dir = tmpDir("lpa")
    orders.flatMap { case (ok, pks) => pks.map(pk => (ok, pk)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // scalar synchronous LPA, argmax by (count desc, label asc)
    val edges = orders.flatMap { case (_, pks) =>
      for (a <- pks; b <- pks if a != b) yield (a, b)
    }.distinct
    val nbrs = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lab: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (v, ns) =>
        val freq = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        v -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lab.values.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
    val got = SparkEntry.queries("graph_lpa_communities")(spark, dir)
      .select($"community", $"n_members").as[(Long, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
    // both cliques must have collapsed onto their min member label
    assert(got.contains(1L) && got(1L) >= 3L)
  }

  test("result is invariant to input partitioning") {
    val a = GraphRank.powerIteration(sym.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphRank.powerIteration(
      sym.toDF("src", "dst").repartition(7), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("mass is conserved up to floor-rounding loss") {
    val scale = 1000000000000L
    val r = refRank(sym, 5, scale)
    val total = GraphRank.powerIteration(sym.toDF("src", "dst"), iters = 5)
      .agg(sum(col("rank"))).as[Long].head()
    assert(total == r.values.sum)
    // every round floors at most (15+85)/100 per node twice; stay within
    // N * iters units of the nominal mass, and never exceed it
    assert(total <= scale)
    assert(total >= scale - 6L * 5L * 100L)
    r.values.foreach(v => assert(v > 0L))
  }

  test("registry query returns the ranked top-25 on the fixture") {
    val rows = SparkEntry.queries("graph_pagerank")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    assert(ranks.forall(_ > 0L))
  }

  test("graph_triangles: hand graph — counts, wedges, clustering exact") {
    // order 1 buys parts {1,2,3} (a triangle), order 2 buys {3,4} (an
    // edge), order 3 re-buys {1,2} (a duplicate edge — must not double-
    // count). Degrees 1:2 2:2 3:3 4:1 → wedges 1+1+3+0 = 5, one
    // triangle, clustering 3·1/5 = 0.6.
    val dir = tmpDir("tri")
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("graph_triangles")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Double]("clustering") == 0.6)
  }
}
