package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list, by
  * iterative min-id label propagation with pointer jumping — the
  * pair→cluster resolution step a near-dup dedup pipeline needs between
  * "LSH emitted similar pairs" and "keep one document per duplicate
  * cluster" (a pair list alone over-deletes when clusters overlap:
  * a–b, b–c must resolve to ONE cluster {a,b,c} with canonical min-id a,
  * not to "drop the right-hand side of every pair").
  *
  * Algorithm (no GraphX, no driver-side row iteration — every step is a
  * hash-partitioned join/agg on the id key):
  *
  *  1. `label(v) ← min(label(v), min over neighbors u of label(u))`
  *     — one edge⋈label join + min-agg;
  *  2. `label(v) ← label(label(v))` (pointer jumping) — one label⋈label
  *     join. Halves the depth of every label-forwarding chain, so
  *     convergence is O(log diameter) rounds instead of O(diameter);
  *     each round is a fixed number of shuffles on the id key.
  *
  * The driver loop only reads one scalar per round — the exact
  * (Decimal-summed) total of all labels, which strictly decreases iff any
  * label changed, because min-propagation and pointer jumping are both
  * monotonically non-increasing on labels. The classic Pregel-style
  * control flow; label data never leaves the executors. Each round's labels are eagerly
  * lineage-truncated (persisted RDD cut, previous round freed), so plan
  * depth and block-manager footprint stay constant
  * across rounds. At 100 TB scale the same loop holds: shuffle volume per round is
  * |V|+|E| fixed-width (id, label) longs, and the round count is
  * logarithmic in the largest near-dup chain (for templated/crawled
  * corpora, effectively ≤ ~20 rounds for billions of docs).
  *
  * Reference analog: none — the reference dedups by exact `message_id`
  * upsert only (src/database.py:88-94); this is the scale path for
  * near-dup corpora. Literature: Kiveris et al., "Connected Components in
  * MapReduce and Beyond" (the large-star/small-star family; min-label +
  * pointer-jumping is the two-phase variant).
  */
object ConnectedComponents {

  /** Release every loop-truncation RDD still held from previous
    * [[resolve]] (and [[BpeTrainer.train]]) calls — see [[LoopRdds]].
    * Kept as the harness-facing entry point (Q/Verify/Bench call it at
    * the same point they clear the SQL cache). */
  def freeAll(): Unit = LoopRdds.freeAll()

  /** Resolve components of the undirected graph given as `(a_id, b_id)`
    * pairs. Returns one row per node appearing in any pair:
    * `(doc_id, cluster_id)` where `cluster_id` is the minimum doc_id in
    * the node's component. The result is persisted (callers run straight
    * into aggregations/joins over it); Verify/Bench clear the cache AND
    * call [[freeAll]] between materializations per the documented harness
    * contract. Throws IllegalStateException if the loop hits `maxIters`
    * without converging — unconverged labels are wrong answers, never
    * returned silently (the default 50 rounds covers any component the
    * pointer-jumping depth-halving can meet in practice: convergence is
    * O(log diameter)).
    *
    * Round shape (two joins, one driver-visible agg — measured down from
    * the original three joins + join-based change count):
    *  - The edge list carries a self-loop per node, so "min over my own
    *    label and my neighbors' labels" is ONE join + min-agg; no
    *    separate left-join back to the label table.
    *  - The edge side is pre-partitioned on the join key (`dst`) and
    *    persisted, so every round's propagation join reuses the cached
    *    exchange instead of re-shuffling |E| rows.
    *  - Convergence is read off the exact label-sum: labels are node ids,
    *    every update is monotonically non-increasing (min-propagation and
    *    pointer jumping both move a label to a value ≤ its current one),
    *    so the Decimal(38)-exact sum strictly decreases iff any label
    *    changed. One scalar agg on the round's already-persisted result
    *    replaces the old prev⋈next count job.
    */
  def resolve(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    // The caller's pair stream is typically the EXPENSIVE end of a dedup
    // pipeline (LSH band join + verify, or a blocked cosine join). It is
    // persisted DIRECTLY — not just the symmetric edge list derived from
    // it — because the symmetrizing union and the self-loop branch
    // reference the pair plan three times: with only the derived list
    // cached, the upstream LSH/cosine chain still executed once per
    // branch inside the first materialization (measured ~2x the verify
    // cost per CC call; with this persist it runs exactly once and every
    // derivation reads 16-byte cached pairs).
    val symPairs = pairs
      .select(col("a_id").cast("long").as("src"), col("b_id").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The count job doubles as the materialization of the persisted pair
    // stage (the expensive LSH/cosine end of the caller's pipeline), so
    // its marginal cost is one driver round trip; it then gates the
    // execution strategy below and sizes the loop's shuffle width.
    val pairRows = symPairs.count()
    // Small-graph fast path: a pair list that fits in one task needs ZERO
    // distributed rounds — min-id components are a single union-find pass
    // (optimization-guide §1.1 first principles: no shuffle is
    // *fundamentally* required for a graph this size). This is the same
    // size-adaptive strategy switch Spark itself makes when AQE rewrites
    // a sort-merge join to a broadcast join: the gate is a measured row
    // count, the bound (1M pair rows ≈ 16 MB of longs — the same order as
    // a broadcast relation) is conf-overridable, and the result is
    // bit-identical because min-id labels are order-independent. Near-dup
    // pair streams at corpus scale exceed the gate and take the
    // distributed loop below, whose plan shape is unchanged; the loop
    // stays spec-covered (ConnectedComponentsSpec pins local ≡
    // distributed on randomized graphs). Measured at the sf0.1 fixture:
    // the loop's driver-bound rounds were ~1.9 s of every CC-bearing
    // query (12 registry queries); the fast path is ~0.1 s.
    val localMax = spark.conf.get(
      "spark.graft.cc.localMaxPairs", DefaultLocalMaxPairs.toString).toLong
    if (pairRows <= localMax) return resolveLocal(spark, symPairs)
    val decSum = (c: org.apache.spark.sql.Column) =>
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    // AQE is suspended for the duration of the loop: every round is the
    // SAME fixed three-stage plan over (id, label) longs — there is
    // nothing for runtime re-planning to discover, and AQE's
    // stage-by-stage execution turns each round into several driver
    // round-trip jobs (measured: most of the CC wall time at fixture
    // scale is that fixed per-job floor, not data). Pregel-style loops
    // are latency-bound per round; static planning is the right trade at
    // every scale — skew lives in the EDGE list, which is handled by the
    // pre-partitioned persisted exchange, not per-round re-planning.
    // NOTE: the conf toggle mutates the SHARED session non-atomically —
    // the harness contract is one driver-side loop per session at a time
    // (run concurrent queries, e.g. a live REST server, on
    // spark.newSession() so each has its own conf view).
    val aqePrev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try resolveLoop(spark, symPairs, pairRows, maxIters, decSum)
    finally aqePrev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  /** Driver-local resolution of a small pair graph: one union-find pass
    * with union-by-min (the smaller root adopts the larger, so every
    * tree root IS its component minimum) plus path compression. Returns
    * a LocalRelation-backed frame — downstream joins against the corpus
    * broadcast it, which is exactly the physical shape the distributed
    * path's tiny label table ends up with anyway. */
  private def resolveLocal(
      spark: org.apache.spark.sql.SparkSession, symPairs: DataFrame): DataFrame = {
    val rows = symPairs.collect()
    symPairs.unpersist(blocking = false)
    val parent = new java.util.HashMap[Long, Long](rows.length * 2)
    def find(x0: Long): Long = {
      var r = x0
      while (parent.get(r) != r) r = parent.get(r)
      var c = x0
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    // sorted output: HashMap iteration order must not leak into the frame
    val out = parent.keySet.asScala.toArray.sorted.map(id => (id, find(id))).toSeq
    val s2 = spark
    import s2.implicits._
    out.toDF("doc_id", "cluster_id")
  }

  /** Default [[resolve]] fast-path gate (`spark.graft.cc.localMaxPairs`):
    * pair lists at or under this row count resolve driver-locally. 1M
    * pairs is ~16 MB of raw longs — the same order as a broadcast
    * relation — while real near-dup corpora produce orders of magnitude
    * more and take the distributed loop. */
  val DefaultLocalMaxPairs = 1000000L

  private def resolveLoop(
      spark: org.apache.spark.sql.SparkSession,
      symPairs: DataFrame,
      pairRows: Long,
      maxIters: Int,
      decSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    // Size the LOOP's shuffle width to the measured edge count. With AQE
    // suspended (above), nothing coalesces the per-round shuffles, and a
    // session-default partition count (sized for corpus-scale scans)
    // turns each round of a small component graph into hundreds of
    // near-empty tasks — measured as most of the per-round wall time at
    // fixture scale. The width is clamped to the session default, so at
    // cluster scale — where |E| rows / SizePerPartition exceeds it — the
    // loop keeps the caller's full parallelism and this is a no-op.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val edgeRows = pairRows * 2L // symmetrized below; self-loops add ~|V| more
    val loopParts = math.max(1L, math.min(sessionParts.toLong,
      edgeRows / RowsPerLoopPartition + 1L)).toInt
    val partsPrev = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try resolveRounds(spark, symPairs, maxIters, decSum)
    finally partsPrev match {
      case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
      case None    => spark.conf.unset("spark.sql.shuffle.partitions")
    }
  }

  /** Rows of fixed-width (id, label) longs per loop-shuffle partition —
    * small enough that a partition is milliseconds of work, large enough
    * that fixture-scale graphs collapse to a handful of tasks per round. */
  private val RowsPerLoopPartition = 250000L

  private def resolveRounds(
      spark: org.apache.spark.sql.SparkSession,
      symPairs: DataFrame,
      maxIters: Int,
      decSum: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val sym = symPairs
      .union(symPairs.select(col("dst").as("src"), col("src").as("dst")))
    val edges = sym
      .union(sym.select(col("src"), col("src").as("dst")).distinct())
      .repartition(col("dst"))
      .persist()
    // Every round's result is lineage-truncated: the pointer-jumping
    // self-join references the round's plan TWICE, so without truncation
    // the logical plan doubles per round — exponential tree growth that
    // stalls the optimizer long before data size matters. Truncation is
    // an explicit RDD persist (df.rdd → createDataFrame) rather than
    // localCheckpoint, because the PREVIOUS round's blocks must be freed
    // deterministically each round — localCheckpoint blocks are invisible
    // to both Dataset.unpersist and catalog.clearCache, and would
    // accumulate rounds × |V| in the block manager until GC-driven
    // cleanup. Only the final round's RDD outlives the call (the returned
    // plan reads it); it is context-cleaned once the caller drops the
    // DataFrame. On a cluster with executor-loss concerns use reliable
    // `checkpoint()` instead (same structure).
    def truncated(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    // Round 0 comes free: while labels are trivial (label(v) = v), the
    // propagation step needs NO label join — min over the self-looped
    // neighborhood of node ids IS the round-0 result. One agg on the
    // cached edge list initializes the labels a full round ahead; its
    // convergence sum is NOT a standalone job — the first iteration's
    // dual-sum aggregate (below) reads it off the persisted round-0 RDD
    // in the same job that materializes iteration 1, saving one driver
    // round trip per resolve() call (~0.3 s × the eight CC-bearing
    // registry queries at fixture scale; at cluster scale, one fewer
    // full-DAG job per dedup run).
    var (labels, labelsRdd) = truncated(
      edges.groupBy(col("src")).agg(min(col("dst")).as("label"))
        .select(col("src").as("id"), col("label")))
    var converged = false
    var iter = 0
    try {
    while (!converged && iter < maxIters) {
      // step 1: min over self + neighborhood — the self-loop rows make the
      // node's own label a member of the aggregated set, and because the
      // edge list is symmetric every node occurs as `src`, so this single
      // join + agg covers the whole vertex set
      // Both per-round joins are hinted SHUFFLE_HASH: the label side is
      // |V| rows, which AQE happily broadcasts at fixture scale — but a
      // broadcast build is an extra driver round-trip job per join per
      // round (measured: it's most of the CC wall time, ~3 extra jobs ×
      // ~0.15 s scheduling floor × rounds), and at 100 TB broadcasting
      // |V| labels is impossible anyway. The shuffle-hash join keeps each
      // round ONE job whose label shuffle is |V| fixed-width rows — the
      // same plan shape at every scale.
      val step1 = edges.join(labels.hint("shuffle_hash"), edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("label"))
        .select(col("src").as("id"), col("label"))
      // step 2: pointer jumping — label values are always node ids (they
      // start as ids and min-propagation only moves existing ids), so the
      // self-join always matches. (A double-jump variant — quartering
      // chain depth per round — was measured SLOWER here: the extra |V|
      // shuffle per round cost more than the saved rounds.)
      val jump = step1.select(col("id").as("jid"), col("label").as("jlabel")).hint("shuffle_hash")
      val (next, nextRdd) = truncated(
        step1.join(jump, step1("label") === jump("jid"))
          .select(step1("id").as("id"), col("jlabel").as("label")))
      // ONE job per round: a union-tagged aggregate materializes `next`
      // (computing it from the cached edges + previous labels) and reads
      // the previous round's sum off its already-persisted RDD in the
      // same action. Labels are node ids and every update is
      // monotonically non-increasing, so sum equality ⟺ no label changed.
      val sums = labels.select(col("label"), lit(0).as("side"))
        .unionAll(next.select(col("label"), lit(1).as("side")))
        .groupBy(col("side")).agg(decSum(col("label")).as("s"))
        .collect()
      // zero groups = empty graph (no pairs at all) — nothing to
      // propagate; `labels` stays the (empty) round-0 frame.
      if (sums.isEmpty) {
        nextRdd.unpersist(blocking = false)
        converged = true
      } else {
        val sumPrev = sums.find(_.getInt(0) == 0).map(_.getDecimal(1)).orNull
        val sumNew = sums.find(_.getInt(0) == 1).map(_.getDecimal(1)).orNull
        if (labelsRdd != null) labelsRdd.unpersist(blocking = false)
        labels = next
        labelsRdd = nextRdd
        // A null sum can only mean non-ANSI Decimal(38,0) overflow
        // (≈1e19 rows of near-Long.Max ids); treat it as "not converged"
        // rather than NPE — both operands need the guard.
        converged = sumNew != null && sumPrev != null && sumNew.compareTo(sumPrev) == 0
      }
      iter += 1
    }
    } catch { case t: Throwable =>
      // Exception paths OTHER than non-convergence (a Spark failure or a
      // cancelled job mid-round): without this, the current round's
      // persisted cut would leak |V|-sized block-manager blocks in a
      // long-lived session. Registering it keeps harness freeAll() able
      // to reclaim; an in-flight nextRdd whose action never completed is
      // reclaimed by the ContextCleaner once unreferenced.
      if (labelsRdd != null) LoopRdds.register(labelsRdd)
      symPairs.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      throw t
    }
    symPairs.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    if (!converged) {
      labelsRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIters rounds " +
          "— refusing to return wrong labels; " +
          "raise maxIters for graphs with astronomically deep chains")
    }
    if (labelsRdd != null) LoopRdds.register(labelsRdd)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Canonical-keep form: the set of doc_ids to DROP — every member of a
    * component except its minimum id. `docs anti-join dropSet` is then the
    * deduplicated corpus. */
  def dropSet(pairs: DataFrame): DataFrame =
    resolve(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
}
