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

    "text_repetition" -> Q(
      "Gopher-style repetition quality filters: per-document top-2-gram fraction and duplicate-2-gram fraction (Rae et al. 2021 §A1.1 repetition signals) — the filters that catch boilerplate/templated text that uniq-token ratios miss",
      (s, dir) => {
        // One explode + one hash-agg per doc+gram, then a per-doc agg:
        // shuffle rows are (doc, gram) pairs — the similarity-join shape,
        // never a per-doc sorted array. All outputs are integer ratios.
        val grams = T.documentsSpread(s, dir)
          .select(col("doc_id"), explode(shingles(tokens(col("text")), 2)).as("g"))
        grams.groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_grams"),
            max(col("c")).as("top_c"),
            sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_c"))
          .select(col("doc_id"), col("n_grams"),
            (col("top_c").cast("double") / col("n_grams").cast("double"))
              .as("top_2gram_frac"),
            (col("dup_c").cast("double") / col("n_grams").cast("double"))
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
        val docs = T.documentsSpread(s, dir)
          .select(col("doc_id"),
            array_distinct(shingles(tokens(col("text")), 3)).as("gr"))
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

    "dedup_minhash_est" -> Q(
      "MinHash estimator instrumentation: estimated Jaccard (matching signature fraction) vs exact Jaccard on the LSH candidate pairs — the measured quality of the signature the banding scheme is built on",
      (s, dir) => {
        val staged = T.documentsSpread(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            array_sort(array_distinct(col("toks"))).as("tset"),
            minhashSignature(shingles(col("toks"), 3), 4).as("sig"))
          .select(col("doc_id"), col("tset"), col("sig"),
            lshBands(col("sig"), 4, 2).as("bands"))
          .persist()
        val bandRows = staged
          .select(col("doc_id"), col("bands"),
            explode(array(lit(0), lit(1))).as("bi"))
          .select(col("doc_id"), col("bi"),
            element_at(col("bands"), col("bi") + 1).as("bv"))
        val cand = bandRows.select(col("doc_id").as("a_id"), col("bi"), col("bv"))
          .join(bandRows.select(col("doc_id").as("b_id"), col("bi"), col("bv")),
            Seq("bi", "bv"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
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
