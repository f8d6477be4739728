package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared maximal-span machinery of the exact-substring dedup family
  * (Lee et al. 2022): the gaps-and-islands merge used by the batch
  * queries (`dedup_substring_maximal` / `_clean` / `_incremental`,
  * `contamination_spans`, `dedup_substring_stats`) and the streaming
  * screen ([[graft.streaming.StreamingSpanScreen]]). ONE implementation
  * on purpose — the r11 island-rule defect survived a round because the
  * engine and its oracle shared a bug; batch and streaming sharing a
  * second implementation would reopen that class of drift. */
object SpanOps {

  /** Gaps-and-islands merge of flagged gram start positions into maximal
    * token ranges [span_start, span_end): two flagged Tk-gram extents
    * [p, p+Tk) and [q, q+Tk), p < q, overlap or touch iff q − p ≤ Tk, so
    * a new island starts exactly when pos − lag(pos) > Tk. The window
    * partitions by doc_id over that document's FLAGGED positions only —
    * never a corpus-wide sort. Emitted spans per document are disjoint
    * with strict gaps (touching extents merge into one range). Physical
    * shape: the lag frame and the running-sum frame share one
    * Sort+Exchange (two Window nodes, no second shuffle — PLANS.md). */
  def spanIslands(flagged: DataFrame, Tk: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("fresh",
        when(col("pos") - lag(col("pos"), 1).over(w) <= Tk, 0L).otherwise(1L))
      .withColumn("grp", sum(col("fresh")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(Tk.toLong)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }
}
