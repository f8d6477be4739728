package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it bit-for-bit. `doc` ties the query back to the SURVEY.md §2
  * operator inventory line it covers.
  */
final case class Q(
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(doc: String, fn: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(doc, fn, Some(oracle))
}
