package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The exact-substring dedup family's PRODUCTION store layout: a
  * materialized, hash-bucketed, within-bucket-sorted table of the
  * ingested corpus's distinct Tk-gram xxhash64 keys, probed by each
  * delta — the "bucketed gram index" posture every span-family Scaladoc
  * has named as the 100 TB form (reference behavior: the exact-substring
  * dedup of Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better", applied incrementally).
  *
  * Why this exists as an OPERATOR and not just a comment: the
  * self-contained `dedup_substring_incremental` registry query rebuilds
  * the store's distinct-gram shuffle on every run, so a scale
  * measurement of it charges the serve path with the ingest path's
  * corpus-sized exchange — measured at the fifth decade (25M→50M docs,
  * r14) that form is spill-bound at slope ~1.3 on one box. Splitting
  * the lifecycle the way a deployment does (ingest once per corpus
  * snapshot; probe per delta) changes what a repeated run MEASURES,
  * never what it computes — the AnnModels train-once/serve-many
  * precedent at whole-operator scale:
  *
  *  - [[ensure]] (ingest, amortized): one distinct-aggregation of the
  *    store half's gram hashes, written `bucketBy(B, h).sortBy(h)` with
  *    exactly one file per bucket (the pre-`repartition(B, $"h")` makes
  *    task i hold bucket i alone), so the on-disk layout IS the shuffle
  *    — hash-partitioned and sorted once, at write time.
  *  - [[probeSpans]] (serve, measured): the delta's positional grams
  *    join the store table on the 8-byte key. The store side arrives
  *    with its bucket partitioning and within-bucket sort order already
  *    satisfied from the files, so the sort-merge join plans NO
  *    Exchange and NO Sort under the store scan (spec-fenced) — the
  *    only corpus-sized shuffle left in the serve path is the delta's
  *    own one hash exchange, which is the irreducible minimum (new rows
  *    must reach their key's partition once).
  *
  * At 100 TB the table is an ordinary bucketed parquet dataset: buckets
  * spread across executors by file, the per-delta probe reads every
  * bucket but shuffles none of it, and bucket count is the same
  * data-sized knob a real cluster turns (256 at 25M docs, 512 at 50M in
  * the r14 rehearsal). Store growth under continuous ingestion is the
  * streaming screen's job ([[graft.streaming.StreamingSpanScreen]]
  * appends novel grams per micro-batch); this operator is the
  * batch-snapshot form those appends compact into — wired, not just
  * promised: [[graft.streaming.StreamingSpanScreen.snapshotGramStore]]
  * reads the stream's committed gram directories and [[buildFromGrams]]
  * rewrites them into this bucketed layout.
  */
object GramStore {

  /** Positional Tk-gram hashes (doc_id, pos, h) — the same row-local
    * explode as the batch span queries and the streaming screen. */
  def gramHashes(docs: DataFrame, Tk: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= Tk)
      .select(col("doc_id"), posexplode(shingles(col("tk"), Tk)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(col("col")).as("h"))

  /** Build the bucketed store table from `storeDocs` (ingest path): the
    * distinct gram hashes, one file per bucket, sorted within. Returns
    * the table name. Overwrites any previous snapshot of the same name. */
  def build(spark: SparkSession, storeDocs: DataFrame, table: String,
      Tk: Int, buckets: Int): String =
    buildFromGrams(spark, gramHashes(storeDocs, Tk).select(col("h")),
      table, buckets)

  /** Build the bucketed snapshot from an already-extracted gram-hash
    * frame (column `h`) — the writer [[build]] uses, exposed so OTHER
    * gram producers can compact into this layout: the streaming span
    * screen's per-batch novel-gram appends
    * ([[graft.streaming.StreamingSpanScreen.snapshotGramStore]]) are the
    * in-tree caller, completing the ladder the family's Scaladocs
    * promise (streaming appends → batch-snapshot compaction → bucketed
    * serve path). Input need not be distinct; the snapshot always is. */
  def buildFromGrams(spark: SparkSession, grams: DataFrame, table: String,
      buckets: Int): String = {
    // a stale location with no catalog entry (fresh in-memory catalog
    // over a reused warehouse dir) would fail the CREATE — clear it
    if (!spark.catalog.tableExists(table)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }
    grams
      .select(col("h")).distinct()
      // one task per bucket -> one file per bucket: repartition by the
      // SAME hash the bucket id uses, so the bucketed scan reports its
      // sortBy order (Spark only trusts per-bucket sortedness when a
      // bucket is a single file) and the probe join plans sort-free
      .repartition(buckets, col("h"))
      .write.mode("overwrite")
      .bucketBy(buckets, "h").sortBy("h")
      .format("parquet").saveAsTable(table)
    table
  }

  /** Idempotent ingest: build the store for `dir`'s even-doc_id half
    * unless this session's catalog already has the snapshot. The table
    * name encodes (dir, Tk, buckets) so distinct fixtures never share a
    * snapshot. */
  def ensure(spark: SparkSession, dir: String, Tk: Int, buckets: Int): String = {
    val table = s"gram_store_${java.lang.Integer.toHexString(dir.hashCode)}_tk${Tk}_b$buckets"
    if (!spark.catalog.tableExists(table)) {
      val docs = graft.Tables.documentsSpread(spark, dir)
        .filter(col("doc_id") % 2 === 0L)
      build(spark, docs, table, Tk, buckets)
    }
    table
  }

  /** Spark ≥3.0 reports a bucketed scan's within-bucket sort order only
    * behind this flag, because a multi-file bucket interleaves its
    * files' sorted runs. [[build]] guarantees exactly ONE file per
    * bucket (the pre-repartition by the bucket hash), which is
    * precisely the precondition the flag demands — with it on, the
    * probe's sort-merge join plans no store-side Sort at all. Session-
    * scoped and sticky on purpose: physical planning happens lazily at
    * action time, so a set-and-restore around DataFrame construction
    * would restore BEFORE the plan is made. This is the only bucketed
    * table writer in the engine. */
  private def enableBucketSortOrder(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  /** Serve path: the delta frame's store-known maximal token spans —
    * same output contract as `dedup_substring_incremental` (doc_id,
    * span_start, span_end, span_tok; span_end exclusive). */
  def probeSpans(spark: SparkSession, deltaDocs: DataFrame, table: String,
      Tk: Int): DataFrame = {
    enableBucketSortOrder(spark)
    val flagged = gramHashes(deltaDocs, Tk)
      .join(spark.table(table), Seq("h"))
      .select(col("doc_id"), col("pos"))
    SpanOps.spanIslands(flagged, Tk)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tok"))
      .orderBy(col("doc_id"), col("span_start"))
  }
}
