package graft.streaming

import graft.functions.TextFunctions._
import graft.operators.SpanOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The exact-substring dedup family's STREAMING rung — the structured-
  * streaming form of `dedup_substring_incremental`, completing the
  * batch → incremental → streaming ladder the MinHash and CDC families
  * already have: document shards land as JSON, and each micro-batch has
  * its store-known maximal token ranges EXCISED (the Lee et al. 2022
  * removal form) before the novel remainder is appended to the store.
  *
  * Per micro-batch (`foreachBatch`, the stream-vs-static join pattern of
  * [[StreamingCuration.drainIncrementalNearDup]]):
  *  1. explode the batch into positional Tk-gram xxhash64 longs
  *     (row-local, the batch side is micro-batch-sized);
  *  2. probe the persisted gram store — a plain hash join on 8-byte
  *     keys; at 100 TB the store is a bucketed gram index and the probe
  *     reads only matching buckets (the dedup_substring_incremental
  *     posture, STREAM_SCALE store-pruning argument);
  *  3. merge flagged positions into maximal spans with the SHARED
  *     [[SpanOps.spanIslands]] rule (one island implementation for
  *     batch, streaming, and the DuckDB twins) and cut the covered
  *     tokens out row-locally (tokens never leave their row);
  *  4. append the cleaned documents to the doc store, and the cleaned
  *     text's novel distinct grams to the gram store (grams of CLEANED
  *     text, so future deltas dedup against what was actually stored;
  *     the store stays distinct via an anti-join before the append).
  *
  * Like the batch incremental form, within-batch duplication is NOT
  * flagged (new-new pairs belong to the periodic full `dedup_substring_
  * maximal` re-run — the same Lambda-style split the incremental
  * near-dup screen documents). Excision-boundary grams of a cleaned
  * document (straddling a removed and a kept token) are deliberately
  * absent from the store: a later copy of the ORIGINAL document still
  * excises fully whenever its kept-side runs are ≥ Tk or within Tk of a
  * known extent (the islands merge bridges gaps ≤ Tk — the r12 rule).
  *
  * State at scale: the gram store is the only unbounded artifact — one
  * 8-byte hash per distinct stored gram, hash-partitioned; no Spark
  * state-store entry exists at all (dedup state lives in the data
  * layout, which survives restarts and is shared by batch jobs).
  */
object StreamingSpanScreen {

  val Tk = 8

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** (doc_id, pos, h) positional gram hashes of a tokenized frame
    * (`tk`: array&lt;string&gt;); docs shorter than Tk emit no rows. */
  private def gramHashes(toksDf: DataFrame): DataFrame =
    toksDf
      .filter(size(col("tk")) >= Tk)
      .select(col("doc_id"), posexplode(shingles(col("tk"), Tk)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(col("col")).as("h"))

  /** One micro-batch: excise store-known spans, return the cleaned
    * frame (doc_id, n_tok, removed_tok, clean_tk, clean_text). Exposed
    * for the spec; `drain` wires it into foreachBatch. */
  private[streaming] def exciseAgainstStore(
      batch: DataFrame, gramStore: Option[DataFrame]): DataFrame = {
    val toksDf = batch.select(col("doc_id"), tokens(col("text")).as("tk"))
    val spans = gramStore match {
      case None => null
      case Some(store) =>
        val flagged = gramHashes(toksDf)
          .join(store.select(col("h")), Seq("h"))
          .select(col("doc_id"), col("pos"))
        SpanOps.spanIslands(flagged, Tk)
          .groupBy(col("doc_id"))
          .agg(collect_list(struct(
            col("span_start").as("s"), col("span_end").as("e"))).as("spans"),
            sum(col("span_end") - col("span_start")).as("removed_tok"))
    }
    val joined =
      if (spans == null)
        toksDf.withColumn("spans",
            lit(null).cast("array<struct<s:bigint,e:bigint>>"))
          .withColumn("removed_tok", lit(null).cast("long"))
      else toksDf.join(spans, Seq("doc_id"), "left")
    joined
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        coalesce(col("removed_tok"), lit(0L)).as("removed_tok"),
        when(col("spans").isNull, col("tk"))
          .otherwise(filter(col("tk"), (t, i) =>
            !exists(col("spans"), sp =>
              i.cast("long") >= sp("s") && i.cast("long") < sp("e"))))
          .as("clean_tk"))
      .withColumn("clean_text", array_join(col("clean_tk"), " "))
  }

  /** Doc-store row shape (what the drain writes per cleaned doc). */
  val docStoreSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_tok", LongType),
    StructField("removed_tok", LongType),
    StructField("clean_text", StringType)))

  /** Gram-store row shape: one xxhash64 per distinct stored gram. */
  val gramStoreSchema: StructType =
    StructType(Seq(StructField("h", LongType)))

  /** Consumer reads over the batch-keyed stores `drain` maintains. */
  def readDocStore(spark: SparkSession, docStoreDir: String): DataFrame =
    BatchKeyedStore.read(spark, docStoreDir, docStoreSchema)
  def readGramStore(spark: SparkSession, gramStoreDir: String): DataFrame =
    BatchKeyedStore.read(spark, gramStoreDir, gramStoreSchema)

  /** Compact the stream's accumulated gram store into the bucketed
    * batch-snapshot layout ([[graft.operators.GramStore]]) — the
    * "batch-snapshot form those appends compact into" the family's
    * Scaladocs promise. Bounded by the checkpoint's commit log (the
    * [[BatchKeyedStore.readCommitted]] view), so a crashed attempt's
    * uncommitted directory is never baked into the snapshot. The
    * returned table serves [[graft.operators.GramStore.probeSpans]]
    * with no store-side Exchange or Sort; the stream itself keeps
    * appending to `gramStoreDir` independently — snapshotting is a
    * read-only fork, the Lambda split the incremental screens document
    * (continuous appends for the delta screen, periodic snapshots for
    * the heavy batch probes). */
  def snapshotGramStore(spark: SparkSession, gramStoreDir: String,
      checkpointDir: String, table: String, buckets: Int): String =
    graft.operators.GramStore.buildFromGrams(spark,
      BatchKeyedStore.readCommitted(
        spark, gramStoreDir, gramStoreSchema, checkpointDir),
      table, buckets)

  /** Directory-count hygiene between drains: fold both stores' committed
    * batch directories into one base each
    * ([[BatchKeyedStore.compact]]), bounded by the checkpoint's commit
    * log so an uncommitted crashed attempt is never baked into the base. */
  def compactStores(spark: SparkSession, docStoreDir: String,
      gramStoreDir: String, checkpointDir: String): Unit =
    BatchKeyedStore.lastCommitted(spark, checkpointDir).foreach { last =>
      BatchKeyedStore.compact(spark, docStoreDir, docStoreSchema, last)
      BatchKeyedStore.compact(spark, gramStoreDir, gramStoreSchema, last)
    }

  /** Drain everything currently in `landingDir`: cleaned docs land in
    * `docStoreDir`, their novel grams in `gramStoreDir` — both
    * [[BatchKeyedStore]] layouts. Exactly-once per checkpoint: each
    * batch's two writes are batchId-keyed overwrites, and the gram
    * probe reads only STRICTLY EARLIER batches, so a replayed batch
    * excises and stores identically regardless of where the first
    * attempt crashed (the idempotency argument is on
    * [[BatchKeyedStore]]). Returns after the drain. */
  def drain(spark: SparkSession, landingDir: String, docStoreDir: String,
      gramStoreDir: String, checkpointDir: String): Unit = {
    val q: StreamingQuery = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1) // page the drain like G3 micro-batching
      .json(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        runBatch(batch, batchId, docStoreDir, gramStoreDir)
      }
      .start()
    q.awaitTermination()
  }

  /** The foreachBatch body — exposed `private[graft]` so the specs can
    * REPLAY a batch literally (a crash-replay is exactly a second
    * invocation with the same batchId and rows). */
  private[graft] def runBatch(batch: DataFrame, batchId: Long,
      docStoreDir: String, gramStoreDir: String): Unit = {
    val s = batch.sparkSession
    val store = BatchKeyedStore.readBefore(
      s, gramStoreDir, batchId, gramStoreSchema)
    // cleaned feeds the doc write AND the gram write; persist so
    // the store probe + islands window run once, and unpersist — a
    // long-lived stream must not accumulate per-batch cache entries
    val cleaned = exciseAgainstStore(batch, store).persist()
    try {
      // coalesce(4): batch-sized outputs written raw would shed up to
      // spark.sql.shuffle.partitions near-empty part files per batch
      // dir, growing the probe's file listing 32× per batch (the
      // URL-screen measurement caught this as a latency trend)
      BatchKeyedStore.write(
        cleaned.select(col("doc_id"), col("n_tok"), col("removed_tok"),
          col("clean_text")).coalesce(4),
        docStoreDir, batchId)
      val batchGrams = gramHashes(
        cleaned.select(col("doc_id"), col("clean_tk").as("tk")))
        .select(col("h")).distinct()
      val novel = store match {
        case Some(st) =>
          batchGrams.join(st.select(col("h")), Seq("h"), "left_anti")
        case None => batchGrams
      }
      BatchKeyedStore.write(novel.coalesce(4), gramStoreDir, batchId)
    } finally { cleaned.unpersist(); () }
  }
}
