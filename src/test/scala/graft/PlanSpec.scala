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

  test("q3_shipping: both date filters pushed; customer dim broadcast") {
    val p = plan("q3_shipping")
    assert(p.contains("LessThan(o_orderdate"))
    assert(p.contains("GreaterThan(l_shipdate"))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q5_nation_revenue: every dimension broadcast, one fact-fact shuffle join") {
    val p = plan("q5_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4,
      "supplier/customer/nation/region should all broadcast")
    assert("SortMergeJoin".r.findAllIn(p).length <= 1,
      "only lineitem⋈orders may shuffle")
  }

  test("e5_asof_join: no join operator at all — union + single window per key") {
    val p = plan("e5_asof_join")
    assert(!p.contains("Join"), "as-of must not plan a join")
    assert(p.contains("Window"))
    assert(p.contains("Union"))
  }

  test("skew_salted_agg: two aggregation layers (salted partials then merge)") {
    val p = plan("skew_salted_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "expected partial+final pairs for both the salted and merge stages")
  }

  test("c11_cube: Expand feeds partial+final aggregation") {
    val p = plan("c11_cube")
    assert(p.contains("Expand"))
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("feat1_quantile_bins_scale: no window, no global sort — broadcast cuts + hash agg") {
    val p = plan("feat1_quantile_bins_scale")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      "scale-safe binning must not plan a window")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "cut points must broadcast")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final aggregation over bins")
  }

  test("dedup_simhash: signature computed in-row — no Generate, no shuffle") {
    val p = plan("dedup_simhash")
    assert(p.contains("simhash16"), "expected the codegen'd SimHash16 expression")
    assert(!p.contains("Generate"), "signature must not explode rows")
    assert(!p.contains("HashAggregate"), "signature must not aggregate")
  }

  test("text_contamination: benchmark side broadcasts, doc_id range pushed to scan") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("LessThan(doc_id,3)") && p.contains("GreaterThanOrEqual(doc_id,3)"))
  }

  test("w1_window_suite: single window exchange serves all window functions") {
    val p = plan("w1_window_suite")
    // rank/ntile/percent_rank/cume_dist/lag/lead share one (partition,
    // order) spec; the framed sum adds its own Window node but NO extra
    // exchange beyond the per-key repartition
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"window functions over the same spec must share one exchange:\n$p")
  }
}
