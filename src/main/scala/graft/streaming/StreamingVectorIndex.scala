package graft.streaming

import graft.functions.VectorFunctions.cosineSim
import graft.queries.VectorSearchQueries.bucketCol
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The ANN index's INCREMENTAL form: embedding batches land as a
  * structured stream, each vector is assigned its hyperplane bucket
  * row-locally (the same deterministic planes every batch ANN query
  * uses), optionally screened for semantic near-duplicates against the
  * ACCUMULATED index, and appended to a bucket-partitioned store — the
  * streaming twin of `dedup_semantic_incremental`, maintaining the
  * `ann_lsh_knn` physical layout continuously instead of rebuilding it
  * per crawl.
  *
  * Scale design:
  *  - bucket assignment is a row-local codegen'd projection — the stream
  *    stage is stateless (no watermark, no state store), so ingest
  *    parallelism is bounded only by the source;
  *  - the store is `partitionBy(bucket)` parquet: the dup screen's
  *    bucket equi-join and every serving-time probe read ONLY the
  *    touched bucket partitions (partition pruning — the same argument
  *    as the batch ANN layout, now preserved under continuous append);
  *  - near-dup screening per batch is O(|batch| × bucket occupancy),
  *    the store×store pair space is never revisited (same contract as
  *    [[StreamingCuration.drainIncrementalNearDup]] on the token side);
  *  - exactly-once: the foreachBatch append is guarded by the stream
  *    checkpoint — re-draining an already-drained landing dir with the
  *    same checkpoint appends nothing.
  *
  * Reference analog: none (the reference embeds point-wise per email,
  * src/embedder.py — this is the corpus-scale continuous-ingest
  * extension of that surface).
  */
object StreamingVectorIndex {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Index bucket width — the retrieval layout (`ann_lsh_knn` probes the
    * same 8-plane family prefix via the prefix property). */
  val IndexPlanes = 8

  /** Cosine threshold above which an arriving vector is a semantic
    * duplicate of a stored one (matches `dedup_semantic*`). */
  val DupCos = 0.35

  /** The bucketed ingest stream (unsinked — callers pick the sink).
    * Bucket values carry a `b` prefix: they become partition DIRECTORY
    * names, and an all-digit "01011010" would round-trip through
    * partition-column type inference as a number, losing its leading
    * zeros — the prefix pins them as strings end to end. */
  def bucketed(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", 1)
      .json(landingDir)
      .filter(col("embedding").isNotNull)
      .withColumn("bucket",
        concat(lit("b"), bucketCol(col("embedding"), IndexPlanes)))

  /** Drain the landing dir into the bucket-partitioned index, exactly
    * once per checkpoint. With `screenDups`, each batch is first deduped
    * within itself (keep-first by vec_id) and against the accumulated
    * index — the vector-side incremental near-dup contract. */
  def drainToIndex(spark: SparkSession, landingDir: String, indexDir: String,
      checkpointDir: String, screenDups: Boolean = false): Unit = {
    val q: StreamingQuery = bucketed(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val rows = batch.persist()
        val survivors =
          if (!screenDups) rows
          else {
            // within-batch keep-first: a vector whose bucket holds an
            // earlier (smaller-id) near-duplicate in the SAME batch drops
            val a = rows.select(col("vec_id").as("a_id"), col("bucket"),
              col("embedding").as("va"))
            val b = rows.select(col("vec_id").as("b_id"), col("bucket"),
              col("embedding").as("vb"))
            val inBatchDup = a.join(b, Seq("bucket"))
              .filter(col("a_id") < col("b_id"))
              .filter(cosineSim(col("va"), col("vb")) >= DupCos)
              .select(col("b_id").as("vec_id")).distinct()
            val afterBatch = rows.join(inBatchDup, Seq("vec_id"), "left_anti")
            // vs store: bucket equi-join against ONLY the touched
            // partitions of the persisted index (partition pruning on
            // the store side — the store is never re-bucketed)
            val fs = new org.apache.hadoop.fs.Path(indexDir)
              .getFileSystem(s.sessionState.newHadoopConf())
            if (!fs.exists(new org.apache.hadoop.fs.Path(indexDir))) afterBatch
            else {
              val store = s.read.parquet(indexDir)
                .select(col("bucket"), col("embedding").as("vs"))
              val vsStoreDup = afterBatch
                .join(store, Seq("bucket"))
                .filter(cosineSim(col("embedding"), col("vs")) >= DupCos)
                .select(col("vec_id")).distinct()
              afterBatch.join(vsStoreDup, Seq("vec_id"), "left_anti")
            }
          }
        survivors
          .select(col("vec_id"), col("embedding"), col("label"), col("bucket"))
          .write.partitionBy("bucket").mode("append").parquet(indexDir)
        rows.unpersist(false)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Serve top-k from the live index: probe the query's bucket plus every
    * Hamming-1 neighbor (the `ann_lsh_multiprobe` probe set over the
    * index's own plane family), prune the scan to those partitions, exact
    * cosine rerank. `probes = 0` probes only the home bucket. */
  def knnFromIndex(spark: SparkSession, indexDir: String,
      query: Array[Float], k: Int, probes: Int = IndexPlanes): DataFrame = {
    import spark.implicits._
    // 1-row bucket computation rides the same expression as ingest —
    // a bounded driver boundary, like the batch ANN query-vector fetch
    val qb = Seq(Tuple1(query)).toDF("q")
      .select(bucketCol(col("q"), IndexPlanes)).head.getString(0)
    val flips = (0 until math.min(probes, IndexPlanes)).map { i =>
      val c = if (qb.charAt(i) == '1') '0' else '1'
      qb.updated(i, c)
    }
    val probeSet = (qb +: flips).distinct.map("b" + _)
    spark.read.parquet(indexDir)
      .filter(col("bucket").isin(probeSet: _*))
      .select(col("vec_id"), col("label"),
        cosineSim(col("embedding"), typedLit(query.toSeq)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
