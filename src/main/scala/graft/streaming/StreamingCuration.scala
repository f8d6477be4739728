package graft.streaming

import graft.functions.GramStats
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The curation pipeline's INCREMENTAL form: the same gates
  * `curation_pipeline_full` applies in batch, expressed as a structured
  * stream over a landing directory, with exact dedup as stateful
  * streaming `dropDuplicates` — new corpus shards land, only novel
  * documents come out.
  *
  * Stage mapping (batch registry twin → streaming form):
  *  - quality gate + repetition gate: row-local expressions (identical
  *    Columns — the point of keeping gates scalar: they apply unchanged
  *    to a streaming plan);
  *  - exact dedup: `dropDuplicates(fp)` backed by the state store —
  *    duplicates are dropped ACROSS micro-batches, which the batch
  *    window-on-fingerprint cannot do incrementally;
  *  - near-dup screening: [[drainIncrementalNearDup]] checks each batch
  *    against the accumulated store's persisted signatures (stream-vs-
  *    static LSH band join) and resolves within-batch clusters with the
  *    CC operator; a full-corpus `dedup_cluster_cc` re-run stays a
  *    periodic batch (the Lambda-style split the reference's
  *    sync-then-analyze flow also uses, src/etl_pipeline.py:233-245) —
  *    incremental screening cannot merge two ALREADY-STORED docs that a
  *    late arrival connects.
  *
  * State at scale: fingerprint state is one 32-char md5 per distinct doc,
  * hash-partitioned across executors; with event-time input add
  * `withWatermark` before `dropDuplicates` to bound it (the documents
  * fixture is timeless, so the bounded `AvailableNow` drain is the
  * steady-state demo here).
  */
object StreamingCuration {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** The gated + deduped stream (unsinked — callers pick the sink). */
  def curated(spark: SparkSession, landingDir: String): DataFrame = {
    val toks = tokens(col("text"))
    val st = GramStats.gramStats(col("toks"), 2)
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1) // page the drain like G3 micro-batching
      .json(landingDir)
      .select(col("doc_id"), col("text"), toks.as("toks"))
      .select(col("doc_id"), col("text"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        st.as("st"))
      .filter(col("n_tok") >= 20 &&
        col("n_uniq").cast("double") / col("n_tok").cast("double") >= 0.15)
      .filter(col("st.dup_c").cast("double")
        / col("st.n_grams").cast("double") <= 0.2)
      .withColumn("fp", fingerprint(col("text")))
      .dropDuplicates("fp")
      .select("doc_id", "text", "fp")
  }

  /** Drain everything currently in `landingDir` into `outDir` (parquet),
    * exactly once per checkpoint. Returns after the drain. */
  def drainTo(spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val q: StreamingQuery = curated(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** INCREMENTAL near-dup curation: the gated + exact-deduped stream,
    * additionally screened for MinHash-LSH near-duplicates against the
    * ACCUMULATED store before appending to it — new corpus shards pay
    * O(batch × colliding-band rows), never a recompute over all pairs.
    *
    * Per micro-batch (`foreachBatch`, the stream-vs-static join pattern):
    *  1. signature each batch doc (distinct token set, MinHash bands) —
    *     the same staging `dedup_minhash_lsh` uses;
    *  2. within-batch near-dups resolve by connected components with
    *     canonical min-id keep (the `dedup_cluster_cc` operator, on a
    *     batch-sized graph);
    *  3. survivors band-join against the store's PERSISTED signatures
    *     (signatures are written with the docs, so the store is never
    *     re-signatured), verify exact Jaccard ≥ 0.8, drop hits;
    *  4. append survivors WITH their signatures to the store.
    *
    * Store schema: (doc_id, text, fp, tset, bands). At scale the band
    * values become the store's partition keys, so step 3 reads only the
    * store partitions the batch's bands touch — the same
    * partition-pruning argument as the ANN bucket layout. */
  def drainIncrementalNearDup(spark: SparkSession, landingDir: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    val q: StreamingQuery = curated(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val staged = batch
          .withColumn("toks", tokens(col("text")))
          .select(col("doc_id"), col("text"), col("fp"),
            array_sort(array_distinct(col("toks"))).as("tset"),
            lshBands(minhashSignature(shingles(col("toks"), 3), 4), 4, 2)
              .as("bands"))
          .persist()
        val bandRows = staged
          .select(col("doc_id"), col("tset"), col("bands"),
            explode(array(lit(0), lit(1))).as("bi"))
          .withColumn("bv", element_at(col("bands"), col("bi") + 1))
          .drop("bands")
        // within-batch: CC over verified pairs, keep component minimum
        val cand = bandRows.select(col("doc_id").as("a_id"), col("bi"), col("bv"))
          .join(bandRows.select(col("doc_id").as("b_id"), col("bi"), col("bv")),
            Seq("bi", "bv"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val tsets = staged.select(col("doc_id"), col("tset"))
        val pairs = cand
          .join(tsets.select(col("doc_id").as("a_id"), col("tset").as("ta")), Seq("a_id"))
          .join(tsets.select(col("doc_id").as("b_id"), col("tset").as("tb")), Seq("b_id"))
          .filter(graft.functions.ArrayFunctions
            .jaccardSorted(col("ta"), col("tb")) >= 0.8)
          .select(col("a_id"), col("b_id"))
        val batchKept = staged.join(
          graft.operators.ConnectedComponents.dropSet(pairs),
          Seq("doc_id"), "left_anti")
        // vs store: band-join against persisted signatures, exact verify
        val fs = new org.apache.hadoop.fs.Path(storeDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        val out =
          if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir))) batchKept
          else {
            val store = s.read.parquet(storeDir)
            val storeBands = store
              .select(col("doc_id").as("s_id"), col("tset").as("ts"),
                col("bands"), explode(array(lit(0), lit(1))).as("bi"))
              .withColumn("bv", element_at(col("bands"), col("bi") + 1))
              .drop("bands")
            val dupVsStore = batchKept
              .select(col("doc_id"), col("tset"),
                explode(array(lit(0), lit(1))).as("bi"),
                col("bands"))
              .withColumn("bv", element_at(col("bands"), col("bi") + 1))
              .join(storeBands, Seq("bi", "bv"))
              .filter(graft.functions.ArrayFunctions
                .jaccardSorted(col("tset"), col("ts")) >= 0.8)
              .select(col("doc_id")).distinct()
            batchKept.join(dupVsStore, Seq("doc_id"), "left_anti")
          }
        out.write.mode("append").parquet(storeDir)
        staged.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }
}
