package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming URL-frontier-screen scale measurement — [[StreamScale]]'s
  * methodology pointed at [[graft.streaming.StreamingUrlScreen]]:
  *
  *  1. batch-size scaling — equal-total drains at shard sizes S/2S/4S
  *     into fresh stores (per-batch latency ~linear in shard size: the
  *     batch side is row-local canonicalization + one batch-sized
  *     window);
  *  2. store-growth — one long drain over the whole corpus in
  *     fixed-size shards: the curve over batch id exposes the store-side
  *     cost (the canon-key anti-join probe), which at fixture scale is a
  *     flat columnar read of the key column and at 100 TB is a
  *     hash-bucketed store the probe prunes (SCALE.md posture).
  *
  * Pages are synthesized from the documents fixture with the SHARED
  * [[graft.queries.WebQueries.rawUrlCol]] synth, so the canon-collision
  * structure matches the batch family's.
  * Usage: UrlStreamScale [docsParquet] [workDir]
  */
object UrlStreamScale {
  def main(args: Array[String]): Unit = {
    val docsParquet = args.lift(0).getOrElse("/root/repo/scale10/documents.parquet")
    val work        = args.lift(1).getOrElse("/tmp/graft-urlscale")
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

    /** JSON shards of (doc_id, url, n_chars) — writeShards' layout with
      * the frontier schema. */
    def writePageShards(landing: String, shardRows: Int, maxDocs: Long): Int = {
      val pages = spark.read.parquet(docsParquet)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          graft.queries.WebQueries.rawUrlCol(col("doc_id")).as("url"),
          col("n_chars"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      val sharded = pages
        .withColumn("rn", row_number().over(w) - 1)
        .filter(col("rn") < maxDocs)
        .withColumn("shard", (col("rn") / shardRows).cast("int"))
      val nShards = sharded.agg(max(col("shard"))).collect()(0).getInt(0) + 1
      sharded.select(col("shard"), col("doc_id"), col("url"), col("n_chars"))
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").partitionBy("shard").json(landing + "/by_shard")
      (0 until nShards).foreach { k =>
        val src = fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$landing/by_shard/shard=$k/part-*"))
        require(src.nonEmpty, s"no part file for shard $k")
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

    def drain(landing: String, tag: String): Seq[(Long, Long, Long)] = {
      val rec = new StreamScale.Recorder
      spark.streams.addListener(rec)
      try graft.streaming.StreamingUrlScreen.drain(
        spark, landing, s"$work/docs-$tag", s"$work/urls-$tag",
        s"$work/ckpt-$tag")
      finally spark.streams.removeListener(rec)
      rec.batches.toSeq
    }
    def stats(b: Seq[(Long, Long, Long)]): (Int, Double, Double) = {
      val ds = b.map(_._3.toDouble / 1000.0)
      (b.size, ds.sum / math.max(1, ds.size), if (ds.isEmpty) 0 else ds.max)
    }

    val sizeRows = Seq(625, 1250, 2500).map { s =>
      val landing = s"$work/landing-size$s"
      writePageShards(landing, s, maxDocs = 10000)
      val (n, mean, mx) = stats(drain(landing, s"size$s"))
      println(f"SIZE shard=$s batches=$n mean=${mean}%.2fs max=${mx}%.2fs")
      (s, n, mean, mx)
    }

    val landing = s"$work/landing-growth"
    val nSh = writePageShards(landing, 2500, maxDocs = Long.MaxValue)
    val growth = drain(landing, "growth")
    growth.foreach { case (id, rows, ms) =>
      println(f"GROWTH batch=$id rows=$rows sec=${ms / 1000.0}%.2f")
    }

    val sizeJson = sizeRows.map { case (s, n, mean, mx) =>
      f"""{"shard_rows":$s,"batches":$n,"mean_sec":$mean%.3f,"max_sec":$mx%.3f}"""
    }.mkString("[", ",", "]")
    val growthJson = growth.map { case (id, rows, ms) =>
      f"""{"batch":$id,"rows":$rows,"sec":${ms / 1000.0}%.3f}"""
    }.mkString("[", ",", "]")
    val line =
      s"""{"docs":"$docsParquet","shards_growth":$nSh,"size_scaling":$sizeJson,"store_growth":$growthJson}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("URL_STREAM_SCALE.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println("URL_STREAM_SCALE " + line)
    spark.stop()
  }
}
