package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the dedup_minhash_lsh third-decade reading: candidate
  * pair count, verified pair count, and the band-bucket size distribution
  * at a given fixture — separates "the OUTPUT is quadratic" (no algorithm
  * avoids it) from "false candidates are quadratic" (a prefilter fixes
  * it). Usage: LshProbe <dir> */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/scale100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val (staged, cand) = graft.queries.TextOpsQueries.lshStage(docs)

    // bucket-size distribution: docs per (band_idx, band_val)
    val bandRows = staged
      .select(col("doc_id"), col("bands"),
        explode(array(lit(0), lit(1))).as("band_idx"))
      .select(col("band_idx"),
        element_at(col("bands"), col("band_idx") + 1).as("band_val"))
    val buckets = bandRows.groupBy("band_idx", "band_val").agg(count(lit(1)).as("m"))
      .persist()
    val top = buckets.orderBy(col("m").desc).limit(10).collect()
    println("TOP BUCKETS (band_idx, band_val_prefix, m):")
    top.foreach(r => println(s"  ${r.getInt(0)}  ${r.getString(1).take(24)}  ${r.getLong(2)}"))
    val pairWork = buckets.agg(expr("sum((m * (m - 1)) div 2)")).collect()(0).getLong(0)
    val nDocs = staged.count()
    val nCand = cand.count()
    val nVerified = graft.queries.TextOpsQueries.lshVerifiedPairs(staged, cand, 0.8).count()
    println(s"PROBE dir=$dir docs=$nDocs bucket_pair_work=$pairWork candidates=$nCand verified=$nVerified")
    spark.stop()
  }
}
