package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming-curation scale measurement (VERDICT r7 task #7): drive
  * [[graft.streaming.StreamingCuration.drainIncrementalNearDup]] over the
  * ScaleUp 10× corpus, paged one shard file per micro-batch
  * (`maxFilesPerTrigger=1`), and record per-batch wall latency two ways:
  *
  *  1. batch-size scaling — equal-total drains at shard sizes S, 2S, 4S
  *     into FRESH stores: per-batch latency should scale ~linearly with
  *     shard size (the O(batch) claim);
  *  2. store-growth — one long drain (the full corpus in fixed-size
  *     shards): the per-batch latency curve over batch id exposes the
  *     store-side cost (band-signature scan of the accumulated store),
  *     which at fixture scale is a flat columnar read and at 100 TB is
  *     partition-pruned by band value (SCALE.md).
  *
  * Latency comes from Spark's own `StreamingQueryListener` progress
  * events (triggerExecution duration), not wrapper stopwatches, so the
  * numbers are the engine's micro-batch accounting.
  *
  * Usage: StreamScale [docsParquet] [workDir]
  */
object StreamScale {
  final class Recorder extends StreamingQueryListener {
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val dur = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      if (p.numInputRows > 0)
        batches += ((p.batchId, p.numInputRows, dur))
    }
  }

  /** Split `n` docs into JSON shard files of `shardRows` docs each under
    * `landing` (one file == one micro-batch under maxFilesPerTrigger=1). */
  def writeShards(spark: SparkSession, docsParquet: String, landing: String,
      shardRows: Int, maxDocs: Long): Int = {
    val docs = spark.read.parquet(docsParquet)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
    // shard id by doc_id order — deterministic, contiguous ranges
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val sharded = docs
      .withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") < maxDocs)
      .withColumn("shard", (col("rn") / shardRows).cast("int"))
    val nShards = sharded.agg(max(col("shard"))).collect()(0).getInt(0) + 1
    sharded.select(col("shard"), col("doc_id"), col("text"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").json(landing + "/by_shard")
    // flatten part files into landing/shard-<k>.json so the file source
    // sees one file per shard, in shard order by name
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0 until nShards).foreach { k =>
      val src = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$landing/by_shard/shard=$k/part-*"))
      require(src.nonEmpty, s"no part file for shard $k")
      // partitionBy(shard) writes each shard's rows into exactly one
      // partition dir; concatenate defensively if the writer split it
      val dst = fs.create(new org.apache.hadoop.fs.Path(
        f"$landing/shard-$k%04d.json"), true)
      src.foreach { st =>
        val in = fs.open(st.getPath)
        org.apache.hadoop.io.IOUtils.copyBytes(in, dst, 1 << 16, false)
        in.close()
      }
      dst.close()
    }
    fs.delete(new org.apache.hadoop.fs.Path(landing + "/by_shard"), true)
    nShards
  }

  def drain(spark: SparkSession, landing: String, work: String, tag: String)
      : Seq[(Long, Long, Long)] = {
    val rec = new Recorder
    spark.streams.addListener(rec)
    try graft.streaming.StreamingCuration.drainIncrementalNearDup(
      spark, landing, s"$work/store-$tag", s"$work/ckpt-$tag")
    finally spark.streams.removeListener(rec)
    rec.batches.toSeq
  }

  def main(args: Array[String]): Unit = {
    val docsParquet = args.lift(0).getOrElse("/root/repo/scale10/documents.parquet")
    val work        = args.lift(1).getOrElse("/tmp/graft-streamscale")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    def stats(b: Seq[(Long, Long, Long)]): (Int, Double, Double) = {
      val ds = b.map(_._3.toDouble / 1000.0)
      (b.size, ds.sum / math.max(1, ds.size), if (ds.isEmpty) 0 else ds.max)
    }

    // 1) batch-size scaling: same 10k-doc total, shard sizes 625/1250/2500
    val sizeRows = Seq(625, 1250, 2500).map { s =>
      val landing = s"$work/landing-size$s"
      writeShards(spark, docsParquet, landing, s, maxDocs = 10000)
      val b = drain(spark, landing, work, s"size$s")
      val (n, mean, mx) = stats(b)
      println(f"SIZE shard=$s batches=$n mean=${mean}%.2fs max=${mx}%.2fs")
      (s, n, mean, mx)
    }

    // 2) store growth: full corpus in 2500-doc shards, one long drain
    val landing = s"$work/landing-growth"
    val nSh = writeShards(spark, docsParquet, landing, 2500, maxDocs = Long.MaxValue)
    val growth = drain(spark, landing, work, "growth")
    growth.foreach { case (id, rows, ms) =>
      println(f"GROWTH batch=$id rows=$rows sec=${ms / 1000.0}%.2f")
    }

    val sizeJson = sizeRows.map { case (s, n, mean, mx) =>
      f"""{"shard_rows":$s,"batches":$n,"mean_sec":$mean%.3f,"max_sec":$mx%.3f}"""
    }.mkString("[", ",", "]")
    val growthJson = growth.map { case (id, rows, ms) =>
      f"""{"batch":$id,"rows":$rows,"sec":${ms / 1000.0}%.3f}"""
    }.mkString("[", ",", "]")
    val line = s"""{"docs":"$docsParquet","shards_growth":$nSh,"size_scaling":$sizeJson,"store_growth":$growthJson}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("STREAM_SCALE.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println("STREAM_SCALE " + line)
    spark.stop()
  }
}
