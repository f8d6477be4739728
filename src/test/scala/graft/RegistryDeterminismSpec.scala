package graft

/** The driver's hash compare assumes every registry query is
  * deterministic: same rows, same order, run after run. This suite
  * executes EVERY SparkEntry query twice at smoke scale from fresh plans
  * (cache cleared in between, so persisted stages recompute) and requires
  * identical row sequences — catching nondeterministic tie-breaks,
  * unordered outputs, or accidental dependence on partitioning before the
  * driver's oracle does. */
class RegistryDeterminismSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      spark.catalog.clearCache()
      val a = fn(spark, sf).collect().toSeq
      spark.catalog.clearCache()
      val b = fn(spark, sf).collect().toSeq
      assert(a.size == b.size, s"row count changed: ${a.size} vs ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"row $i differs:\n  $ra\n  $rb")
      }
    }
  }
}
