package graft.tools

import org.apache.spark.sql.SparkSession

/** Streaming span-screen scale measurement — [[StreamScale]]'s
  * methodology pointed at [[graft.streaming.StreamingSpanScreen]]:
  *
  *  1. batch-size scaling — equal-total drains at shard sizes S/2S/4S
  *     into fresh stores (per-batch latency ~linear in shard size: the
  *     batch side is one row-local gram explode + probe);
  *  2. store-growth — one long drain over the whole corpus in
  *     fixed-size shards: the curve over batch id exposes the store-side
  *     cost (the distinct-gram index scan + anti-join), which at fixture
  *     scale is a flat columnar read of 8-byte keys and at 100 TB is a
  *     bucketed index the probe prunes (SCALE.md posture).
  *
  * Latency from Spark's own StreamingQueryListener progress events.
  * Usage: SpanStreamScale [docsParquet] [workDir]
  */
object SpanStreamScale {
  def main(args: Array[String]): Unit = {
    val docsParquet = args.lift(0).getOrElse("/root/repo/scale10/documents.parquet")
    val work        = args.lift(1).getOrElse("/tmp/graft-spanscale")
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

    def drain(landing: String, tag: String): Seq[(Long, Long, Long)] = {
      val rec = new StreamScale.Recorder
      spark.streams.addListener(rec)
      try graft.streaming.StreamingSpanScreen.drain(
        spark, landing, s"$work/docs-$tag", s"$work/grams-$tag",
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
      StreamScale.writeShards(spark, docsParquet, landing, s, maxDocs = 10000)
      val (n, mean, mx) = stats(drain(landing, s"size$s"))
      println(f"SIZE shard=$s batches=$n mean=${mean}%.2fs max=${mx}%.2fs")
      (s, n, mean, mx)
    }

    val landing = s"$work/landing-growth"
    val nSh = StreamScale.writeShards(spark, docsParquet, landing, 2500,
      maxDocs = Long.MaxValue)
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
      java.nio.file.Paths.get("SPAN_STREAM_SCALE.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println("SPAN_STREAM_SCALE " + line)
    spark.stop()
  }
}
