package graft

/** Physical-plan regression guards: the properties that make these
  * queries scale are asserted, not assumed — filter pushdown into the
  * parquet scan, top-k planning as TakeOrderedAndProject (never a full
  * sort), partial+final hash aggregation, broadcast of tiny join sides. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    // Other suites may have cached these table lineages; a cached scan
    // would hide the parquet PushedFilters this suite asserts on.
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.toString
  }

  test("b5_range_topk: pushed date filter + TakeOrderedAndProject") {
    val p = plan("b5_range_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(o_orderdate"))
    assert(!p.contains("SortExec"), "top-k must not plan a full sort")
  }

  test("q1_agg: pushed shipdate filter + partial/final hash aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("LessThanOrEqual(l_shipdate"))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final aggregation")
  }

  test("d1_knn: null/key filters pushed to scan, top-k via TakeOrderedAndProject") {
    val p = plan("d1_knn")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("IsNotNull(embedding)"))
    assert(p.contains("Not(EqualTo(vec_id,0))"))
  }

  test("e2_enrich_topk: dimension side broadcast") {
    val p = plan("e2_enrich_topk")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("e3_anti_join: plans as a join, not a per-row lookup") {
    val p = plan("e3_anti_join")
    assert(p.contains("LeftAnti"))
  }

  test("b1_point_lookup: key predicate reaches the parquet scan") {
    val p = plan("b1_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"))
  }
}
