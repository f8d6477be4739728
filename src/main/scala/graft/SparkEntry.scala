package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered in [[registry]]
  * as a named query over the driver's synthetic tables, with a DuckDB
  * oracle whenever the semantics are ANSI-SQL-expressible (queries without
  * an oracle get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Ordered registry of all implemented operators. */
  def registry: Seq[(String, Q)] =
    _root_.graft.queries.RelationalQueries.all ++
      _root_.graft.queries.VectorSearchQueries.all ++
      _root_.graft.queries.TextOpsQueries.all ++
      _root_.graft.queries.AnalyticsQueries.all ++
      _root_.graft.queries.PipelineQueries.all ++
      _root_.graft.queries.TrainingDataQueries.all ++
      _root_.graft.queries.SelectionQueries.all ++
      _root_.graft.queries.WebQueries.all ++
      _root_.graft.queries.UnigramQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queriesMap("q1_agg")(spark, "/root/testdata/sf0.001")

  private lazy val queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }.toMap

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, _, Some(sql))) => name -> sql }.toMap
}
