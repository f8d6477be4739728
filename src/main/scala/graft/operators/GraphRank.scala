package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank-style graph centrality by fixed-iteration power
  * iteration — the source/domain-ranking signal large-scale curation
  * pipelines attach to every document (CommonCrawl publishes exactly this:
  * a fixed-iteration PageRank over the host graph, joined onto the corpus
  * as a per-domain quality prior; CCNet-style pipelines consume it as a
  * keep-rate weight).
  *
  * Determinism contract — the whole computation is FIXED-POINT INTEGER
  * arithmetic, so the result is bit-identical at any cluster size and in
  * any engine (the basis of the DuckDB oracle for `graph_pagerank`):
  * ranks are BIGINT micro-masses summing to ~`scale`, every division is
  * floor division on non-negative operands, and integer sums are exact
  * and order-independent (a float PageRank would be summation-order
  * dependent and unhashable). With total mass `scale` = 1e12 the largest
  * intermediate (85 × per-node incoming mass) is bounded by 8.5e13 —
  * nowhere near Long overflow, at ANY graph size, because mass is
  * conserved: per-node incoming mass can never exceed the fixed total.
  *
  * Per-round shape (the CC round shape, applied K fixed times instead of
  * to a fixpoint): contributions = edges ⋈ ranks on `src` (the edge side
  * pre-partitioned on `src` and persisted once, so every round reuses the
  * cached exchange; the rank side is |V| fixed-width rows, shuffle-hash
  * joined for the same reason as ConnectedComponents — broadcasting |V|
  * is impossible at scale), then one `sum` aggregation shuffling on
  * `dst`. Map-side partial aggregation absorbs in-degree skew (a hot
  * node's incoming contributions combine per-partition before the
  * shuffle). Shuffle volume per round is |E|+|V| fixed-width longs; K is
  * a constant — at 100 TB this is K scan-sized shuffles, no more.
  *
  * Reference analog: none — this extends the engine beyond the reference
  * (src/ has no graph surface). Literature: Page et al. 1999; the
  * integer-mass formulation follows the classic MapReduce PageRank with
  * conserved integral mass.
  */
object GraphRank {

  /** Run `iters` power-iteration rounds over a directed edge list
    * `(src: long, dst: long)` in which every node has at least one
    * out-edge and one in-edge (any symmetrized undirected graph
    * qualifies). Parallel (duplicate) edges collapse — the operator
    * aggregates the edge list to per-source neighbor SETS, so callers
    * need no upstream `distinct()` of their own. Returns `(id, rank)`
    * with BIGINT ranks on the fixed-point scale:
    *
    *   r0(v)   = scale div N
    *   r_k+1(v) = (15·(scale div N)) div 100
    *              + (85·Σ_{(u,v)∈E} (r_k(u) div outdeg(u))) div 100
    *
    * i.e. damping 0.85 with the classic (1−d)/N teleport, all floor
    * arithmetic. Dangling mass is structurally absent (outdeg ≥ 1).
    */
  def powerIteration(
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")

    // ONE persisted artifact, ONE shuffle to build it: the adjacency-SET
    // table (src, outdeg, dsts[]), hash-partitioned on `src` by its own
    // groupBy. collect_set dedups pairs inside the same exchange the
    // partitioning needs anyway — the former edge-level form spent one
    // shuffle on pair-distinct plus another on a count window, and its
    // cache held one row per EDGE; this one holds |V| rows (array cells
    // still total |E| longs, but per-round join work drops from |E| to
    // |V| streamed rows). outdeg = size(dsts) is free. Per-src buffering
    // is bounded by max outdeg — fine for real graphs (web hosts top out
    // ~1e7 out-edges = ~100 MB of longs); a graph with adversarial
    // single-node fanout would switch to salted two-level aggregation.
    val grouped = edges
      .groupBy(col("src"))
      .agg(collect_set(col("dst")).as("dsts"))
      .select(col("src"), size(col("dsts")).cast("long").as("outdeg"),
        col("dsts"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // |V| is the one driver-side scalar (the IvfIndex-centroid boundary):
    // the teleport terms are global constants of the graph. This count is
    // also the action that materializes the adjacency cache — which IS
    // the vertex table (one row per src), no separate distinct needed.
    val n = grouped.count()
    require(n > 0, "empty edge list")
    val rInit = scale / n
    val base = (15L * rInit) / 100L

    var ranks = grouped.select(col("src").as("id"), lit(rInit).as("rank"))
    // shuffle_hash unconditionally — measured 3× FASTER than broadcast
    // here even though |V| is tiny at test scale (20.4 s vs 6.2 s at
    // sf0.1): round k's rank plan nests all previous rounds, and a
    // broadcast exchange executes its subtree EAGERLY per round, so
    // broadcasting re-runs the growing lineage O(K²) times, while
    // shuffle stages are reused across the nested plans. At 100 TB
    // broadcasting |V| is impossible anyway (the ConnectedComponents
    // argument) — the scale-correct plan and the fast local plan agree.
    // The propagation join streams |V| adjacency rows (not |E| edges);
    // contributions explode AFTER the join, straight into the map-side
    // partial aggregation of the dst-sum shuffle — per round: one |V|-row
    // exchange of ranks, one |E|-cell combine-then-shuffle on dst,
    // in-degree skew absorbed by the partial agg.
    //
    // AQE is suspended for the rank ROUNDS only (the ConnectedComponents
    // / BpeTrainer argument): all K rounds are the SAME join+agg plan
    // over the cached adjacency table, so adaptive re-planning only adds
    // per-round driver round-trips and stage serialization — measured
    // ~0.35 s of the ~2.8 s registry query at sf0.1 (the adjacency BUILD
    // above stays under AQE, where coalescing measurably helps its
    // wide-row aggregations). The toggle needs the ACTION under it, so
    // the final ranks are materialized (persisted + counted) inside the
    // scope and returned cache-backed; callers' downstream reads are
    // plain cache scans. Same single-threaded-session caveat as the
    // other loop operators: concurrent queries belong on
    // spark.newSession().
    val conf = edges.sparkSession.conf
    val aqePrev = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
    for (_ <- 1 to iters) {
      ranks = grouped
        .join(ranks.hint("shuffle_hash"), grouped("src") === ranks("id"))
        .select(explode(col("dsts")).as("dst"),
          expr("rank div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("m"))
        .select(col("dst").as("id"),
          (lit(base) + expr("(85 * m) div 100")).as("rank"))
    }
    val out = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    out
    } finally aqePrev match {
      case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
      case None    => conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
