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
  *  - near-dup LSH/CC: deliberately NOT streamed — candidate generation
  *    is a self-join over the accumulated corpus; the supported shape is
  *    this stream feeding the store, with `dedup_cluster_cc` run as a
  *    periodic batch over it (the Lambda-style split the reference's
  *    sync-then-analyze flow also uses, src/etl_pipeline.py:233-245).
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
}
