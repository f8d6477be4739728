package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage attribution of the co-purchase graph family
  * (edge derivation shared by graph_pagerank / graph_triangles /
  * graph_lpa_communities, then the LPA rounds).
  * Usage: runMain graft.tools.GraphProbe [sfDir]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gstage] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    mat(graft.SparkEntry.queries("graph_lpa_communities")(spark, dir))
    spark.catalog.clearCache()

    (1 to 2).foreach { rep =>
      val edges = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
        .select(explode(col("pks")).as("src"), col("pks"))
        .select(col("src"), explode(col("pks")).as("dst"))
        .filter(col("src") =!= col("dst"))
      time(s"rep$rep edges (no distinct) noop")(mat(edges))
      val dedges = edges.distinct().persist()
      time(s"rep$rep edges distinct persist count")(println(dedges.count()))
      val l1 = dedges.groupBy(col("src")).agg(min(col("dst")).as("lab"))
        .select(col("src").as("v"), col("lab"))
      time(s"rep$rep round1 agg noop")(mat(l1))
      var labels = l1
      for (r <- 2 to 3) {
        labels = dedges
          .join(labels.select(col("v").as("dst"), col("lab")), Seq("dst"))
          .groupBy(col("src"), col("lab")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
          .select(col("src").as("v"), (-col("m.nl")).as("lab"))
      }
      time(s"rep$rep rounds2-3+final noop")(mat(
        labels.groupBy(col("lab").as("community"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("n_members").desc, col("community"))
          .limit(25)))
      dedges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
