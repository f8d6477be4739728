package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Connected-components cluster resolution: fixture graphs (incl. the
  * overlapping-cluster case that motivated replacing greedy pair-drop),
  * convergence on long chains (pointer-jumping must finish well under the
  * iteration cap), and a randomized equality check against a driver-side
  * union-find oracle. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(pairs.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toMap

  test("overlapping clusters a-b, b-c resolve to one component keeping exactly min id") {
    val labels = resolveMap(Seq((1L, 2L), (2L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val drop = ConnectedComponents.dropSet(Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
      .as[Long].collect().toSet
    assert(drop == Set(2L, 3L)) // keep exactly 1
  }

  test("disjoint components keep their own minima; non-edge nodes are absent") {
    val labels = resolveMap(Seq((10L, 12L), (5L, 6L), (12L, 11L)))
    assert(labels == Map(10L -> 10L, 12L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L))
    assert(!labels.contains(7L))
  }

  test("long chain converges (pointer jumping: O(log n) rounds, cap 50)") {
    // path 0-1-2-...-99: worst-case diameter for label propagation
    val chain = (0L until 99L).map(i => (i, i + 1))
    val labels = resolveMap(chain)
    assert(labels.size == 100 && labels.values.forall(_ == 0L))
  }

  test("random graphs match a driver-side union-find oracle") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 120
      val pairs = (1 to 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = inGraph.map { v =>
        // component representative under min-union is the component min
        v -> find(v.toInt).toLong
      }.toMap
      assert(resolveMap(pairs) == expected, s"trial $trial diverged")
    }
  }

  /** Force the distributed loop regardless of graph size (gate = -1). */
  private def distributed[A](f: => A): A = {
    spark.conf.set("spark.graft.cc.localMaxPairs", "-1")
    try f finally spark.conf.unset("spark.graft.cc.localMaxPairs")
  }

  test("local fast path and distributed loop agree on randomized graphs") {
    val rnd = new scala.util.Random(13)
    (1 to 2).foreach { trial =>
      val n = 80
      val pairs = (1 to 120).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val local = resolveMap(pairs) // default gate: takes the local path
      val dist = distributed(resolveMap(pairs))
      assert(local == dist, s"trial $trial: local path diverged from loop")
    }
  }

  test("long chain converges on the distributed loop too (pointer jumping, cap 50)") {
    val chain = (0L until 99L).map(i => (i, i + 1))
    val labels = distributed(resolveMap(chain))
    assert(labels.size == 100 && labels.values.forall(_ == 0L))
  }

  test("maxIters exhaustion throws instead of returning unconverged labels") {
    val chain = (1L until 16L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      distributed(
        ConnectedComponents.resolve(chain.toDF("a_id", "b_id"), maxIters = 1))
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("freeAll releases final-round label blocks; results recompute from lineage") {
    val labels = distributed(
      ConnectedComponents.resolve(Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")))
    assert(labels.count() == 4)
    val persisted = spark.sparkContext.getPersistentRDDs.size
    ConnectedComponents.freeAll()
    assert(spark.sparkContext.getPersistentRDDs.size < persisted,
      "freeAll should unpersist the final labels RDD clearCache cannot see")
    // the returned plan still works — it recomputes through lineage
    assert(labels.count() == 4)
  }
}
