package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of `dedup_substring_maximal` across scale decades
  * — the LshProbe pattern ("the standard first move on any super-linear
  * reading", SCALE.md round 9): time each pipeline stage separately at
  * two fixtures so a drifting end-to-end slope can be attributed to the
  * stage that actually moved (gram explode, the corpus-sized
  * gram-frequency aggregation, the dup back-join, or the islands
  * window + span aggregation).
  *
  * Usage: SpanProbe [dirA] [dirB]
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/repo/scale100")
    val dirB = args.lift(1).getOrElse("/tmp/scale1000")
    val Tk = 8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    def grams(dir: String): DataFrame =
      graft.Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= Tk)
        .select(col("doc_id"), posexplode(shingles(col("tk"), Tk)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          xxhash64(col("col")).as("h"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[spanprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    Seq(dirA, dirB).foreach { dir =>
      println(s"== $dir ==")
      spark.catalog.clearCache()
      // stage 1: gram stream alone (explode + hash, no shuffle)
      time("grams (row-local)") { grams(dir).count() }
      // stage 2: + the corpus-sized frequency aggregation
      time("dup-gram agg") {
        grams(dir).groupBy(col("h")).agg(count(lit(1)).as("f"))
          .filter(col("f") >= 2).count()
      }
      // stage 3: + the ids-only back-join (flagged positions)
      val g = grams(dir)
      val dupg = g.groupBy(col("h")).agg(count(lit(1)).as("f"))
        .filter(col("f") >= 2)
      time("flagged join") {
        g.join(dupg, Seq("h")).select(col("doc_id"), col("pos")).count()
      }
      // stage 4: full query (adds the islands window + span agg)
      time("maximal (full)") {
        graft.operators.SpanOps.spanIslands(
          g.join(dupg, Seq("h")).select(col("doc_id"), col("pos")), Tk).count()
      }
    }
    spark.stop()
  }
}
