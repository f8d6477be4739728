package graft.queries

import graft.Q
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Pipeline-composition operators: the steps that turn per-row / per-pair
  * primitives into corpus-level curation decisions — near-dup cluster
  * resolution (connected components + canonical keep) over the LSH pair
  * stream, and its summary statistics.
  *
  * Oracle strategy: DuckDB computes the same components with a recursive
  * CTE (min reachable id per node over the bidirectional edge list), so
  * the iterative Spark loop is hash-checked end-to-end, not just spec'd.
  */
object PipelineQueries {

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
  )
}
