package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split graph_pagerank cost into edge-build vs rank rounds. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
      .select(explode(col("pks")).as("src"), col("pks"))
      .select(col("src"), explode(col("pks")).as("dst"))
      .filter(col("src") =!= col("dst"))
    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t0 = System.nanoTime()
      val grouped = edges.groupBy(col("src"))
        .agg(collect_set(col("dst")).as("dsts"))
        .select(col("src"), size(col("dsts")).cast("long").as("outdeg"), col("dsts"))
        .persist()
      val n = grouped.count()
      val t1 = System.nanoTime()
      val ranks = graft.operators.GraphRank.powerIteration(edges, iters = 5)
      val t2 = System.nanoTime()
      ranks.orderBy(col("rank").desc, col("id")).limit(25)
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"[rank] run=$r edgebuild=${(t1-t0)/1e9}%.2f full_pi=${(t2-t1)/1e9}%.2f topk=${(t3-t2)/1e9}%.2f (n=$n)")
    }
    spark.stop()
  }
}
