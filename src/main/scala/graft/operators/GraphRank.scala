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
    * qualifies). Returns `(id, rank)` with BIGINT ranks on the
    * fixed-point scale:
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

    // ONE persisted artifact: edges with outdeg attached, hash-partitioned
    // on `src` (so every round's propagation join reuses the cached
    // partitioning without re-shuffling |E| rows). outdeg rides a
    // count-over-partition WINDOW on the same src shuffle the cache needs
    // anyway — one pass, no aggregate side, no join; the previous
    // deg-aggregate + join form executed the upstream edge pipeline
    // (often a distinct over a pair self-join, the expensive part) once
    // per join side (measured ~1.2 s of the 4.7 s query at sf0.1).
    // Whole-partition count buffers one src's edge list per window group —
    // bounded by max outdeg, fine for real graphs (web hosts top out
    // ~1e7 out-edges = ~100 MB of longs); a graph with adversarial
    // single-node fanout would switch back to partial-agg + join.
    val edgesD = edges
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The vertex table derives from the cache once and is itself persisted
    // (|V| longs): the window output is already hash-partitioned on `src`,
    // so this distinct is exchange-free, and the ranks init below reads it
    // back instead of re-scanning |E| cached rows a second time.
    val verts = edgesD.select(col("src")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // |V| is the one driver-side scalar (the IvfIndex-centroid boundary):
    // the teleport terms are global constants of the graph. This count is
    // also the action that materializes edgesD and verts.
    val n = verts.count()
    require(n > 0, "empty edge list")
    val rInit = scale / n
    val base = (15L * rInit) / 100L

    var ranks = verts.select(col("src").as("id"), lit(rInit).as("rank"))
    // shuffle_hash unconditionally — measured 3× FASTER than broadcast
    // here even though |V| is tiny at test scale (20.4 s vs 6.2 s at
    // sf0.1): round k's rank plan nests all previous rounds, and a
    // broadcast exchange executes its subtree EAGERLY per round, so
    // broadcasting re-runs the growing lineage O(K²) times, while
    // shuffle stages are reused across the nested plans. At 100 TB
    // broadcasting |V| is impossible anyway (the ConnectedComponents
    // argument) — the scale-correct plan and the fast local plan agree.
    for (_ <- 1 to iters) {
      ranks = edgesD
        .join(ranks.hint("shuffle_hash"), edgesD("src") === ranks("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("m"))
        .select(col("dst").as("id"),
          (lit(base) + expr("(85 * m) div 100")).as("rank"))
    }
    ranks
  }
}
