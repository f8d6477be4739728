package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the ppjoin pipeline (mirrors the
  * registry query; keep in sync when editing dedup_ppjoin). */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.HashedShinglesFunctions
          .hashedShingles(tokens(col("text")), 2).as("ts"))
      .persist()
    time("docs materialize")(docs.count())

    val sizes = docs.select(col("doc_id"), size(col("ts")).as("n"))
    val tok = docs.select(col("doc_id"), col("source"), explode(col("ts")).as("t"))
    time("tok count")(println(tok.count()))

    val df = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
    time("df count")(println(df.count()))

    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("t"))
    val prefixes = tok.join(df, Seq("t"))
      .join(sizes, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - expr("(n + 1) div 2") + 1)
      .select(col("doc_id"), col("source"), col("t"), col("rn"), col("n"))
      .persist()
    time("prefixes materialize")(println(prefixes.count()))

    val cand = prefixes
      .select(col("doc_id").as("a_id"), col("source"), col("t"),
        col("rn").as("pa"), col("n").as("na"))
      .join(prefixes.select(col("doc_id").as("b_id"), col("source"),
        col("t"), col("rn").as("pb"), col("n").as("nb")),
        Seq("source", "t"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")) * 2 >= greatest(col("na"), col("nb")))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
        >= expr("(na + nb + 2) div 3"))
      .select("a_id", "b_id").distinct()
      .persist()
    time("cand materialize")(println(cand.count()))

    val out = cand
      .join(docs.select(col("doc_id").as("a_id"), col("ts").as("ta")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("ts").as("tb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.ArrayFunctions.jaccardSorted(col("ta"), col("tb")).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("a_id"), col("b_id"))
    time("verify+sort")(println(out.count()))
    spark.stop()
  }
}
