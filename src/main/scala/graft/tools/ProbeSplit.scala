package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: split a registry query's timed cost into CONSTRUCTION
  * (the builder fn call — for effectful builders this runs driver-side
  * loops like ConnectedComponents.resolve) and MATERIALIZATION (the noop
  * write of the returned plan). Both are measured min-of-3 after a warm
  * pass, mirroring Bench methodology.
  * Usage: runMain graft.tools.ProbeSplit <q1,q2,...> [sfDir]
  */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      graft.operators.ConnectedComponents.freeAll()
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      clear(); try mat(fn(spark, dir)) finally clear() // warm
      val runs = (1 to 3).map { _ =>
        clear()
        System.gc(); Thread.sleep(30)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        mat(df)
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val bestTotal = runs.minBy(r => r._1 + r._2)
      println(f"[split] $name construct=${bestTotal._1}%.2fs " +
        f"materialize=${bestTotal._2}%.2fs total=${bestTotal._1 + bestTotal._2}%.2fs")
    }
    spark.stop()
  }
}
