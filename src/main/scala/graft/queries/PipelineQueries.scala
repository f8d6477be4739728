package graft.queries

import graft.{Q, Tables => T}
import graft.functions.TextFunctions._
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Pipeline-composition operators: the steps that turn per-row / per-pair
  * primitives into corpus-level curation decisions — near-dup cluster
  * resolution (connected components + canonical keep) over the LSH pair
  * stream and its summary statistics, Gopher-style repetition quality
  * filters, benchmark-contamination screening, and MinHash-estimator
  * instrumentation.
  *
  * Oracle strategy: DuckDB computes the same components with a recursive
  * CTE (min reachable id per node over the bidirectional edge list), so
  * the iterative Spark loop is hash-checked end-to-end, not just spec'd;
  * every quality/contamination metric is rational integer-ratio
  * arithmetic (bit-portable doubles), per the repo-wide parity policy.
  */
object PipelineQueries {
  import TextOpsQueries.{ToksSql, shinglesSql}

  /** Shared recursive-CTE tail: from a CTE `pairs(a_id, b_id, …)`, derive
    * `comp(id, cluster_id)` = per-node component minimum. Must be spliced
    * under a `WITH RECURSIVE` header. */
  private[queries] val CcSqlCtes: String =
    """edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM pairs
      |  UNION ALL SELECT b_id, a_id FROM pairs),
      |cnodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach AS (
      |  SELECT id, id AS r FROM cnodes
      |  UNION
      |  SELECT e.dst AS id, reach.r AS r
      |  FROM reach JOIN edges e ON e.src = reach.id),
      |comp AS (
      |  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  /** Stage graph of the full curation composite, shared by
    * `curation_pipeline_full` (final keep set) and `curation_funnel`
    * (per-stage survivor counts).
    *
    * Funnel-sharing design (round 8): every funnel count is a
    * `df.observe` CollectMetrics counter attached AT the stage boundary
    * inside the composite plan itself, so the ONE action that
    * materializes the keep set yields all six counts as side-channel
    * metrics — the funnel query is that action plus driver-side metric
    * reads, and its marginal cost over `curation_pipeline_full` is ~0.
    * The quality stage still persists WITH the repetition verdict as a
    * flag (`r_ok`) rather than as a filtered-away frame (the composite's
    * candidate set is the flag filter; the n2/n3 metrics ride the same
    * node), and stages 4/6 derive by subtraction (contaminated ⊆
    * candidates, dropSet ⊆ exact, both distinct on doc_id by
    * construction). History: the r6 form re-ran unpersisted scans per
    * funnel branch (judge-measured 4.97 s vs the pipeline's 3.89 s); the
    * r7 form fused the branches into per-frame aggregations but still
    * paid the whole LSH+CC stage graph a second time under the bench's
    * clearCache contract (6.36 s); the observe form pays it once. */
  /** Side-channel stage counters (Spark `Observation` handles): every
    * funnel count fires as a `CollectMetrics` metric DURING the
    * composite's own materialization — verified (ObservationSpec-style
    * probe + CurationSpec) to fire even for nodes beneath the stage
    * graph's persist boundaries, so reading them costs zero extra jobs
    * beyond the one action that materializes the keep set. */
  private final case class FunnelObs(
      corpus: org.apache.spark.sql.Observation,       // n1
      quality: org.apache.spark.sql.Observation,      // n2 (+ n3 = r_ok)
      contaminated: org.apache.spark.sql.Observation, // nc
      exact: org.apache.spark.sql.Observation,        // n5
      dropSet: org.apache.spark.sql.Observation)      // nd

  private final case class CurationStages(
      quality: org.apache.spark.sql.DataFrame,      // persisted; carries r_ok
      contaminated: org.apache.spark.sql.DataFrame, // ⊆ candidates, distinct
      exact: org.apache.spark.sql.DataFrame,        // persisted (doc_id, toks)
      dropSet: org.apache.spark.sql.DataFrame,      // ⊆ exact, distinct
      kept: org.apache.spark.sql.DataFrame,         // final keep set (doc_id)
      obs: FunnelObs)

  private def fullCurationStages(
      s: org.apache.spark.sql.SparkSession, dir: String): CurationStages = {
    import org.apache.spark.sql.Observation
    val obs = FunnelObs(Observation(), Observation(), Observation(),
      Observation(), Observation())
    // Tokenize is recomputed per consuming branch below the persist
    // boundary (columnar re-scan + split beats a persist barrier here —
    // measured).
    val base = T.documentsSpread(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    // benchmark = docs 0-2 (held out; never enters the corpus).
    // Grams travel as xxhash64 longs on both contamination sides (the
    // dedup_ppjoin representation): join keys and shuffle rows are
    // 8 bytes, and collisions (~2⁻⁶⁴·m²) are below the oracle's
    // resolution — the string-gram twin is text_contamination.
    val bench = base.filter(col("doc_id") < 3)
      .select(explode(graft.functions.HashedShinglesFunctions
        .hashedShingles(col("toks"), 3)).as("g3"))
      .distinct()
    // gate 1: quality (length + uniq-token ratio), corpus side only;
    // gate 2: repetition — dup-2gram fraction ≤ 0.2, row-local via the
    // codegen'd GramStats expression (no gram shuffle at all), carried as
    // the r_ok flag on the persisted quality frame
    val st = graft.functions.GramStats.gramStats(col("toks"), 2)
    val quality = base.filter(col("doc_id") >= 3)
      .observe(obs.corpus, count(lit(1)).as("n1"))
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"))
      .filter(col("n_tok") >= 20 &&
        col("n_uniq").cast("double") / col("n_tok").cast("double") >= 0.15)
      .withColumn("st", st)
      .withColumn("r_ok", col("st.dup_c").cast("double")
        / col("st.n_grams").cast("double") <= 0.2)
      .select(col("doc_id"), col("text"), col("toks"), col("r_ok"))
      .observe(obs.quality, count(lit(1)).as("n2"),
        count(when(col("r_ok"), lit(1))).as("n3"))
      .persist()
    val candidates = quality.filter(col("r_ok"))
    // gate 3: decontamination — drop candidates with ≥ 0.1 benchmark
    // overlap. Screening only the surviving candidates (not the whole
    // corpus) is result-identical: the contaminated set is consumed by
    // an anti-join against these candidates, so ids outside them are
    // irrelevant — and it skips the 3-gram explode for already-dropped
    // docs.
    val contaminated = candidates
      .select(col("doc_id"), graft.functions.HashedShinglesFunctions
        .hashedShingles(col("toks"), 3).as("gr"))
      .select(col("doc_id"), size(col("gr")).cast("long").as("ng"),
        explode(col("gr")).as("g3"))
      .join(broadcast(bench), Seq("g3"))
      .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("nh"))
      .filter(col("nh").cast("double") / col("ng").cast("double") >= 0.1)
      .select("doc_id")
      .observe(obs.contaminated, count(lit(1)).as("nc"))
    val gated = candidates
      .join(contaminated, Seq("doc_id"), "left_anti")
    // stage 4: exact dedup, keep min doc_id per fingerprint
    val exact = gated
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("toks"))
      .observe(obs.exact, count(lit(1)).as("n5"))
      .persist()
    // stage 5: the shared LSH stage over survivors → CC canonical keep
    val (staged, cand) = TextOpsQueries.lshStage(exact)
    val pairs = TextOpsQueries.lshVerifiedPairs(staged, cand, 0.8)
      .select("a_id", "b_id")
    val dropSet = ConnectedComponents.dropSet(pairs)
      .observe(obs.dropSet, count(lit(1)).as("nd"))
    val kept = exact.select(col("doc_id"))
      .join(dropSet, Seq("doc_id"), "left_anti")
    CurationStages(quality, contaminated, exact, dropSet, kept, obs)
  }

  /** The full composite's CTE chain (through `exact`, `pairs`, `comp`) —
    * spliced under WITH RECURSIVE by both composite oracles. */
  private lazy val fullCurationCtesSql: String = {
    import TextOpsQueries.minhashSql
    s"""dgr AS (
       |  SELECT doc_id, list_distinct(${shinglesSql(ToksSql, 3)}) AS gr FROM documents),
       |bench AS (SELECT DISTINCT unnest(gr) AS g3 FROM dgr WHERE doc_id < 3),
       |quality AS (
       |  SELECT doc_id, text, $ToksSql AS toks FROM documents
       |  WHERE doc_id >= 3 AND len($ToksSql) >= 20
       |    AND len(list_distinct($ToksSql))::DOUBLE / len($ToksSql)::DOUBLE >= 0.15),
       |gc AS (
       |  SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id, unnest(${shinglesSql("toks", 2)}) AS g FROM quality)
       |  GROUP BY doc_id, g),
       |rep AS (
       |  SELECT doc_id FROM gc GROUP BY doc_id
       |  HAVING SUM(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE
       |    / SUM(c)::DOUBLE <= 0.2),
       |cont AS (
       |  SELECT doc_id FROM (
       |    SELECT e.doc_id, len(d.gr) AS ng, COUNT(*) AS nh
       |    FROM (SELECT doc_id, unnest(gr) AS g3 FROM dgr WHERE doc_id >= 3) e
       |    JOIN bench USING (g3)
       |    JOIN dgr d ON d.doc_id = e.doc_id
       |    GROUP BY e.doc_id, len(d.gr))
       |  WHERE nh::DOUBLE / ng::DOUBLE >= 0.1),
       |gated AS (
       |  SELECT q.doc_id, q.text, q.toks FROM quality q
       |  JOIN rep USING (doc_id)
       |  WHERE q.doc_id NOT IN (SELECT doc_id FROM cont)),
       |exact AS (
       |  SELECT doc_id, toks FROM gated
       |  QUALIFY row_number() OVER (
       |    PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
       |    ORDER BY doc_id) = 1),
       |sigs AS (
       |  SELECT doc_id, list_distinct(toks) AS tset,
       |    ${(0 until 4).map(seed =>
          s"${minhashSql(shinglesSql("toks", 3), seed)} AS m$seed").mkString(", ")}
       |  FROM exact),
       |bands AS (
       |  SELECT doc_id, tset, 0 AS bi, m0 || m1 AS bv FROM sigs
       |  UNION ALL SELECT doc_id, tset, 1, m2 || m3 FROM sigs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.tset AS ta, b.tset AS tb
       |  FROM bands a JOIN bands b
       |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT a_id, b_id FROM cand
       |  WHERE len(list_intersect(ta, tb))::DOUBLE
       |    / (len(ta)::DOUBLE + len(tb)::DOUBLE - len(list_intersect(ta, tb))::DOUBLE) >= 0.8),
       |$CcSqlCtes""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    "dedup_cluster_cc" -> Q(
      "Near-dup cluster resolution: connected components (min-id label propagation + pointer jumping) over the MinHash-LSH verified pair stream, with canonical keep = component minimum",
      (s, dir) => ConnectedComponents
        .resolve(TextOpsQueries.lshNearDupPairs(s, dir))
        .withColumn("keep", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id")),
      s"""WITH RECURSIVE ${TextOpsQueries.LshPairsSqlCtes},
         |$CcSqlCtes
         |SELECT id AS doc_id, cluster_id, (id = cluster_id) AS keep
         |FROM comp ORDER BY doc_id""".stripMargin),

    "split_leakage_safe" -> Q(
      "Leakage-safe train/eval split: every near-dup cluster is assigned atomically by md5 of its canonical id (singleton docs are their own cluster), so no verified near-dup pair ever straddles train/eval — the train-test contamination guard that doc-level hash splitting (samp2_split) cannot give; eval = top ~10% of the 256 hash buckets",
      (s, dir) => {
        // The cluster table is pairs-docs only — at corpus scale a tiny
        // fraction of rows — so the left join attaches it cheaply and
        // every singleton falls through row-locally via coalesce. The
        // split decision hashes the CLUSTER id, so all members land
        // together by construction; no second pass, no group-by.
        val cc = ConnectedComponents
          .resolve(TextOpsQueries.lshNearDupPairs(s, dir))
        val assigned = T.documents(s, dir).select(col("doc_id"))
          .join(cc.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        val bucket = conv(
          substring(md5(col("cluster_id").cast("string")), 1, 2), 16, 10)
          .cast("long")
        assigned
          .withColumn("split", when(bucket < 230L, "train").otherwise("eval"))
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE ${TextOpsQueries.LshPairsSqlCtes},
         |$CcSqlCtes,
         |assigned AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2)) AS BIGINT) < 230
         |    THEN 'train' ELSE 'eval' END AS split
         |FROM assigned ORDER BY doc_id""".stripMargin),

    "dedup_cluster_stats" -> Q(
      "Near-dup cluster summary: member count and id span per resolved cluster — the dedup report a curation run emits",
      (s, dir) => ConnectedComponents
        .resolve(TextOpsQueries.lshNearDupPairs(s, dir))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("cluster_id")),
      s"""WITH RECURSIVE ${TextOpsQueries.LshPairsSqlCtes},
         |$CcSqlCtes
         |SELECT cluster_id, COUNT(*) AS n_members, MAX(id) AS max_id
         |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),

    "dedup_keep_best" -> Q(
      "Quality-aware canonical selection: within each resolved near-dup cluster keep the BEST member (most-curated source first, then longest text, then min id) instead of the arbitrary min-id — the keep rule real curation pipelines use when duplicate copies differ in provenance or truncation (the canonical copy of a boilerplate page should be the full-length one from the cleaner crawl)",
      (s, dir) => {
        // Only cluster MEMBERS need arbitration — a near-dup-sized set,
        // ≪ corpus — so the ranking window runs over the CC labels joined
        // to their quality columns, never over the corpus; singletons fall
        // through the left join row-locally with keep=true. At 100 TB the
        // window's partition key is cluster_id with per-cluster fan-in
        // bounded by cluster size — no global sort, no corpus shuffle
        // beyond the one id-keyed join that attaches the arbitration
        // columns.
        val cc = ConnectedComponents.resolve(TextOpsQueries.lshNearDupPairs(s, dir))
        val docs = T.documentsSpread(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val members = cc.select(col("doc_id"), col("cluster_id"))
          .join(docs, Seq("doc_id"))
          .withColumn("prio", substring(col("source"), 4, 10).cast("int"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))
          .orderBy(col("prio").asc, col("n_chars").desc, col("doc_id").asc)
        val best = members.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("cluster_id"), col("doc_id").as("best_id"))
        docs.select(col("doc_id"))
          .join(cc.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .join(best, Seq("cluster_id"), "left")
          .select(col("doc_id"), col("cluster_id"),
            (col("best_id").isNull || col("doc_id") === col("best_id")).as("keep"))
          .orderBy(col("doc_id"))
      },
      s"""WITH RECURSIVE ${TextOpsQueries.LshPairsSqlCtes},
         |$CcSqlCtes,
         |members AS (
         |  SELECT c.id AS doc_id, c.cluster_id,
         |    CAST(substr(d.source, 4) AS INT) AS prio, d.n_chars
         |  FROM comp c JOIN documents d ON d.doc_id = c.id),
         |best AS (
         |  SELECT cluster_id, doc_id AS best_id FROM (
         |    SELECT cluster_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY cluster_id
         |        ORDER BY prio ASC, n_chars DESC, doc_id ASC) AS rk
         |    FROM members) WHERE rk = 1),
         |assigned AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT a.doc_id, a.cluster_id,
         |  (b.best_id IS NULL OR a.doc_id = b.best_id) AS keep
         |FROM assigned a LEFT JOIN best b ON b.cluster_id = a.cluster_id
         |ORDER BY a.doc_id""".stripMargin),

    "text_repetition" -> Q(
      "Gopher-style repetition quality filters: per-document top-2-gram fraction and duplicate-2-gram fraction (Rae et al. 2021 §A1.1 repetition signals) — the filters that catch boilerplate/templated text that uniq-token ratios miss",
      (s, dir) => {
        // A document's repetition profile is a property of the ROW: the
        // codegen'd GramStats expression counts k-grams in one in-row
        // pass, so the whole query is scan + project + sort — ZERO
        // shuffles (the explode → groupBy(doc, gram) → groupBy(doc) form
        // it replaces shuffled every gram twice; PropertySpec pins
        // equality). At 100 TB this is scan-bandwidth-bound like any
        // scalar.
        val st = graft.functions.GramStats.gramStats(tokens(col("text")), 2)
        T.documentsSpread(s, dir)
          .select(col("doc_id"), st.as("st"))
          .select(col("doc_id"),
            col("st.n_grams").as("n_grams"),
            (col("st.top_c").cast("double") / col("st.n_grams").cast("double"))
              .as("top_2gram_frac"),
            (col("st.dup_c").cast("double") / col("st.n_grams").cast("double"))
              .as("dup_2gram_frac"))
          .orderBy(col("doc_id"))
      },
      s"""WITH grams AS (
         |  SELECT doc_id, unnest(${shinglesSql(ToksSql, 2)}) AS g FROM documents),
         |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
         |SELECT doc_id,
         |  CAST(SUM(c) AS BIGINT) AS n_grams,
         |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_2gram_frac,
         |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(c) AS DOUBLE) AS dup_2gram_frac
         |FROM gc GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "text_contamination" -> Q(
      "Benchmark decontamination screen: fraction of each document's distinct 3-gram shingles that appear in a held-out benchmark set (docs 0-2 here) — the pre-training overlap check run before any corpus ships",
      (s, dir) => {
        // The benchmark gram set is tiny and broadcasts; the corpus side
        // is one explode + semi-join-shaped count. At 100 TB the benchmark
        // side stays a broadcast (benchmarks are MBs, corpora are TBs).
        // Grams travel as the composite's sorted-distinct xxhash64 longs
        // (codegen'd HashedShingles, one in-row pass): join keys and
        // exploded rows are 8 bytes instead of ~30-char strings, and no
        // string gram array is ever built or array_distinct'd. Counts are
        // hash-collision-exact at ~2^-64·m^2 — below the oracle's
        // resolution, same argument as dedup_ppjoin — so the string-gram
        // oracle SQL hash-matches unchanged.
        val docs = T.documentsSpread(s, dir)
          .select(col("doc_id"), graft.functions.HashedShinglesFunctions
            .hashedShingles(tokens(col("text")), 3).as("gr"))
        val bench = docs.filter(col("doc_id") < 3)
          .select(explode(col("gr")).as("g")).distinct()
        val ex = docs.filter(col("doc_id") >= 3)
          .select(col("doc_id"), size(col("gr")).cast("long").as("n_grams"),
            explode(col("gr")).as("g"))
        ex.join(broadcast(bench), Seq("g"))
          .groupBy(col("doc_id"), col("n_grams"))
          .agg(count(lit(1)).as("n_hits"))
          .select(col("doc_id"), col("n_grams"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_grams").cast("double"))
              .as("contamination"))
          .filter(col("contamination") >= 0.1)
          .orderBy(col("doc_id"))
      },
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct(${shinglesSql(ToksSql, 3)}) AS gr FROM documents),
         |bench AS (
         |  SELECT DISTINCT unnest(gr) AS g FROM docs WHERE doc_id < 3),
         |ex AS (
         |  SELECT doc_id, CAST(len(gr) AS BIGINT) AS n_grams, unnest(gr) AS g
         |  FROM docs WHERE doc_id >= 3)
         |SELECT doc_id, n_grams, n_hits,
         |  CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination
         |FROM (
         |  SELECT doc_id, n_grams, COUNT(*) AS n_hits
         |  FROM ex JOIN bench USING (g)
         |  GROUP BY doc_id, n_grams)
         |WHERE CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.1
         |ORDER BY doc_id""".stripMargin),

    "report_contamination_matrix" -> Q(
      "Contamination governance cross-tab: per SOURCE, how many documents overlap the held-out benchmark at all, how many cross the 0.1 contamination gate, and the total overlapping-gram hits — which crawls are leaking the eval set, not just which documents. Same broadcast-benchmark + hashed-3-gram semi-join shape as text_contamination, one extra tiny rollup",
      (s, dir) => {
        val base = T.documentsSpread(s, dir)
          .select(col("doc_id"), col("source"),
            graft.functions.HashedShinglesFunctions
              .hashedShingles(tokens(col("text")), 3).as("gr"))
        val bench = base.filter(col("doc_id") < 3)
          .select(explode(col("gr")).as("g")).distinct()
        val ex = base.filter(col("doc_id") >= 3)
          .select(col("doc_id"), col("source"),
            size(col("gr")).cast("long").as("n_grams"), explode(col("gr")).as("g"))
        ex.join(broadcast(bench), Seq("g"))
          .groupBy(col("doc_id"), col("source"), col("n_grams"))
          .agg(count(lit(1)).as("n_hits"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs_overlapping"),
            sum(when(col("n_hits").cast("double") / col("n_grams").cast("double")
              >= 0.1, 1L).otherwise(0L)).as("n_docs_contaminated"),
            sum(col("n_hits")).as("total_hits"))
          .orderBy(col("source"))
      },
      s"""WITH docs AS (
         |  SELECT doc_id, source, list_distinct(${TextOpsQueries.shinglesSql(TextOpsQueries.ToksSql, 3)}) AS gr
         |  FROM documents),
         |bench AS (
         |  SELECT DISTINCT unnest(gr) AS g FROM docs WHERE doc_id < 3),
         |ex AS (
         |  SELECT doc_id, source, CAST(len(gr) AS BIGINT) AS n_grams,
         |    unnest(gr) AS g
         |  FROM docs WHERE doc_id >= 3),
         |per AS (
         |  SELECT doc_id, source, n_grams, COUNT(*) AS n_hits
         |  FROM ex JOIN bench USING (g)
         |  GROUP BY doc_id, source, n_grams)
         |SELECT source, COUNT(*) AS n_docs_overlapping,
         |  CAST(SUM(CASE WHEN CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE)
         |    >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_contaminated,
         |  CAST(SUM(n_hits) AS BIGINT) AS total_hits
         |FROM per GROUP BY source ORDER BY source""".stripMargin),

    "dedup_cluster_cohesion" -> Q(
      "Near-dup cluster cohesion report: per CC cluster — member count, verified-edge count, min/max edge Jaccard, and edge density vs the complete graph — the over-merge audit for the banding scheme (a big cluster held together by one weak edge is a banding artifact, not a duplicate family). Cluster-table-sized work throughout; min/max are order-independent so the doubles hash exactly",
      (s, dir) => {
        val pairs = TextOpsQueries.lshNearDupPairs(s, dir).persist()
        val cc = graft.operators.ConnectedComponents.resolve(pairs)
        val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
        val edges = pairs
          .join(cc.select(col("doc_id").as("a_id"), col("cluster_id")), Seq("a_id"))
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_edges"),
            min(col("jac")).as("min_jac"), max(col("jac")).as("max_jac"))
        sizes.join(edges, Seq("cluster_id"))
          .select(col("cluster_id"), col("n_members"), col("n_edges"),
            col("min_jac"), col("max_jac"),
            (col("n_edges").cast("double")
              / (col("n_members") * (col("n_members") - 1L)).cast("double")
              * 2.0).as("density"))
          .orderBy(col("cluster_id"))
      },
      s"""WITH RECURSIVE ${TextOpsQueries.LshPairsSqlCtes},
         |$CcSqlCtes,
         |sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM comp
         |  GROUP BY cluster_id),
         |cedges AS (
         |  SELECT c.cluster_id, COUNT(*) AS n_edges,
         |    MIN(p.jac) AS min_jac, MAX(p.jac) AS max_jac
         |  FROM pairs p JOIN comp c ON c.id = p.a_id
         |  GROUP BY c.cluster_id)
         |SELECT s.cluster_id, s.n_members, e.n_edges, e.min_jac, e.max_jac,
         |  CAST(e.n_edges AS DOUBLE)
         |    / CAST(s.n_members * (s.n_members - 1) AS DOUBLE) * 2.0 AS density
         |FROM sizes s JOIN cedges e USING (cluster_id)
         |ORDER BY cluster_id""".stripMargin),

    "text_token_count_bpe" -> Q(
      "Token counting, all three pipeline flavors per document: whitespace tokens, BPE-ish regex pieces (GPT-2-style run segmentation — letter runs / digit runs / punctuation runs with optional leading space; lookahead-free so Java regex and RE2 agree), and the chars/4 estimator (reference F20 src/embeddings.py:95-107)",
      (s, dir) => {
        val Piece = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
        T.documents(s, dir)
          .select(col("doc_id"),
            tokenCount(col("text")).as("n_ws"),
            size(regexp_extract_all(lower(col("text")), lit(Piece), lit(0)))
              .cast("long").as("n_bpe"),
            graft.functions.EmailFunctions.approxTokenCount(col("text"))
              .as("n_est"))
          .orderBy(col("doc_id"))
      },
      s"""SELECT doc_id,
         |  CAST(len($ToksSql) AS BIGINT) AS n_ws,
         |  CAST(len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT) AS n_bpe,
         |  CAST(ceil(length(text)::DOUBLE / 4.0) AS BIGINT) AS n_est
         |FROM documents ORDER BY doc_id""".stripMargin),

    "curation_pipeline_full" -> Q(
      "The complete curation composite: quality gate → repetition gate (Gopher dup-2gram ≤ 0.2) → benchmark decontamination (< 0.1 overlap vs docs 0-2) → exact dedup → LSH near-dup cluster resolution with canonical keep. Every stage is the registry operator of the same name, composed",
      (s, dir) => fullCurationStages(s, dir).kept.orderBy(col("doc_id")),
      s"""WITH RECURSIVE $fullCurationCtesSql
         |SELECT doc_id FROM exact
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE cluster_id <> id)
         |ORDER BY doc_id""".stripMargin),

    "curation_funnel" -> Q(
      "Curation funnel report: surviving-document count after each stage of the full composite (corpus → quality → repetition → decontamination → exact dedup → near-dup resolution) — the per-stage attrition table every production curation run logs before committing an export; built on the SAME stage graph as curation_pipeline_full. ONE pass total (round-8 change): every stage count is a CollectMetrics side-channel metric (df.observe) attached at the stage boundaries of the composite itself, so the counts fall out of the keep-set materialization the pipeline already performs — the funnel's marginal cost over curation_pipeline_full is the metric reads, ~0. Stages 4 and 6 derive by subtraction (contaminated ⊆ candidates, dropSet ⊆ exact, both distinct on doc_id by construction)",
      (s, dir) => {
        val st = fullCurationStages(s, dir)
        // The composite's own materialization: counting the keep set
        // executes every stage exactly once (quality/exact persist on
        // first touch), firing all five observations as side-channel
        // metrics of this ONE stage-graph run. No per-stage aggregation
        // jobs, no second pass — the r7 form re-aggregated each persisted
        // frame, which still paid the full LSH+CC stage graph a second
        // time under the bench's clearCache contract.
        st.kept.count()
        // A CollectMetrics node whose subtree AQE proves empty is pruned
        // by PropagateEmptyRelation and its observation fulfills with an
        // EMPTY map (probed on 4.1) — pruned-as-empty means the stage
        // count is exactly 0, so missing keys default to 0.
        def metric(o: org.apache.spark.sql.Observation, key: String): Long =
          o.get.getOrElse(key, 0L) match {
            case l: java.lang.Long => l.longValue
            case other             => other.toString.toLong
          }
        val n1 = metric(st.obs.corpus, "n1")
        val n2 = metric(st.obs.quality, "n2")
        val n3 = metric(st.obs.quality, "n3")
        val nc = metric(st.obs.contaminated, "nc")
        val n5 = metric(st.obs.exact, "n5")
        val nd = metric(st.obs.dropSet, "nd")
        val s0 = s
        import s0.implicits._
        Seq(
          (1L, "corpus", n1), (2L, "quality", n2), (3L, "repetition", n3),
          (4L, "decontaminated", n3 - nc), (5L, "exact_dedup", n5),
          (6L, "near_dup_resolved", n5 - nd))
          .toDF("stage_ord", "stage", "n_docs")
          .orderBy(col("stage_ord"))
      },
      s"""WITH RECURSIVE $fullCurationCtesSql,
         |kept AS (
         |  SELECT doc_id FROM exact
         |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE cluster_id <> id))
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_ord, 'corpus' AS stage,
         |    (SELECT COUNT(*) FROM documents WHERE doc_id >= 3) AS n_docs
         |  UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM quality)
         |  UNION ALL SELECT 3, 'repetition', (SELECT COUNT(*) FROM rep)
         |  UNION ALL SELECT 4, 'decontaminated', (SELECT COUNT(*) FROM gated)
         |  UNION ALL SELECT 5, 'exact_dedup', (SELECT COUNT(*) FROM exact)
         |  UNION ALL SELECT 6, 'near_dup_resolved', (SELECT COUNT(*) FROM kept))
         |ORDER BY stage_ord""".stripMargin),

    "text_bigram_lm" -> Q(
      "Corpus bigram transition model: P(b|a) = c(a b)/c(a ·) for the 20 most frequent transitions — the n-gram language-model estimation shape (counts + rational division only; no log-probs, which are not bit-portable)",
      (s, dir) => {
        // two hash-aggs over exploded bigrams; the denominator re-derives
        // from the same gram counts (sum per head word), so the corpus is
        // scanned once and everything downstream is agg-on-agg
        val grams = T.documentsSpread(s, dir)
          .select(explode(shingles(tokens(col("text")), 2)).as("g"))
          .filter(size(split(col("g"), " ")) === 2)
          .select(split(col("g"), " ").getItem(0).as("a"),
            split(col("g"), " ").getItem(1).as("b"))
        val pair = grams.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        val head = pair.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
        pair.join(head, Seq("a"))
          .select(col("a"), col("b"), col("c_ab"),
            (col("c_ab").cast("double") / col("c_a").cast("double")).as("p_b_given_a"))
          .orderBy(col("c_ab").desc, col("a"), col("b"))
          .limit(20)
      },
      s"""WITH grams AS (
         |  SELECT g FROM (
         |    SELECT unnest(${shinglesSql(ToksSql, 2)}) AS g FROM documents)
         |  WHERE len(string_split(g, ' ')) = 2),
         |pair AS (
         |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b,
         |    COUNT(*) AS c_ab
         |  FROM grams GROUP BY 1, 2),
         |head AS (SELECT a, SUM(c_ab) AS c_a FROM pair GROUP BY a)
         |SELECT a, b, c_ab,
         |  CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE) AS p_b_given_a
         |FROM pair JOIN head USING (a)
         |ORDER BY c_ab DESC, a, b LIMIT 20""".stripMargin),

    "dedup_minhash_est" -> Q(
      "MinHash estimator instrumentation: estimated Jaccard (matching signature fraction) vs exact Jaccard on the LSH candidate pairs — the measured quality of the signature the banding scheme is built on",
      (s, dir) => {
        val (staged, cand) = TextOpsQueries.lshStage(
          T.documentsSpread(s, dir)
            .select(col("doc_id"), tokens(col("text")).as("toks")))
        val side = staged.select(col("doc_id"), col("tset"), col("sig"))
        cand
          .join(side.select(col("doc_id").as("a_id"), col("tset").as("ta"),
            col("sig").as("sa")), Seq("a_id"))
          .join(side.select(col("doc_id").as("b_id"), col("tset").as("tb"),
            col("sig").as("sb")), Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            // P[minhash match] = Jaccard, so the matching fraction of the
            // m signature components is the unbiased estimator the whole
            // banding scheme rides on; with m=4 it is quantized to /4
            (size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
              b => b)).cast("double") / lit(4.0)).as("est_jac"),
            graft.functions.ArrayFunctions.jaccardSorted(col("ta"), col("tb"))
              .as("exact_jac"))
          .orderBy(col("a_id"), col("b_id"))
      }, {
        import TextOpsQueries.minhashSql
        val sig = (seed: Int) => s"${minhashSql(shinglesSql(ToksSql, 3), seed)}"
        s"""WITH sigs AS (
           |  SELECT doc_id, list_distinct($ToksSql) AS tset,
           |    ${(0 until 4).map(seed => s"${sig(seed)} AS m$seed").mkString(", ")}
           |  FROM documents),
           |bands AS (
           |  SELECT doc_id, 0 AS bi, m0 || m1 AS bv FROM sigs
           |  UNION ALL SELECT doc_id, 1, m2 || m3 FROM sigs),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           |  FROM bands x JOIN bands y ON x.bi = y.bi AND x.bv = y.bv
           |   AND x.doc_id < y.doc_id)
           |SELECT a_id, b_id,
           |  (${(0 until 4).map(i => s"(a.m$i = b.m$i)::INT").mkString(" + ")})::DOUBLE
           |    / 4.0 AS est_jac,
           |  CASE WHEN len(a.tset) + len(b.tset) - len(list_intersect(a.tset, b.tset)) = 0
           |    THEN 0.0
           |    ELSE len(list_intersect(a.tset, b.tset))::DOUBLE
           |      / (len(a.tset)::DOUBLE + len(b.tset)::DOUBLE
           |         - len(list_intersect(a.tset, b.tset))::DOUBLE)
           |  END AS exact_jac
           |FROM cand JOIN sigs a ON cand.a_id = a.doc_id
           |JOIN sigs b ON cand.b_id = b.doc_id
           |ORDER BY a_id, b_id""".stripMargin
      }),
  )
}
