package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it bit-for-bit. `doc` ties the query back to the SURVEY.md §2
  * operator inventory line it covers.
  *
  * Builder contract, for any caller beyond Verify/Bench:
  *  - Builders MAY be effectful: index-like artifacts (CMS sketch, bloom
  *    filter, IVF centroids, CC labels, the ANN-rule materialization) run
  *    driver-side jobs at CONSTRUCTION time, so constructing/explaining
  *    those queries already executes work (DumpPlans shows a post-hoc
  *    local plan for them).
  *  - Builders MAY persist() internal stages and do not unpersist them
  *    (the stages are consumed by the returned lazy plan, so the builder
  *    cannot know when materialization is done). Callers that compose
  *    many queries must `spark.catalog.clearCache()` between
  *    materializations, as Verify and Bench do.
  */
final case class Q(
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(doc: String, fn: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(doc, fn, Some(oracle))
}
