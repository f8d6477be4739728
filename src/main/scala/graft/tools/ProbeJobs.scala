package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: job-level attribution of one registry query — how many
  * Spark jobs a composed plan launches and where the wall time pools
  * (tiny-data composites are job-scheduling-bound, so job COUNT is the
  * first thing to read). Optionally re-times with AQE disabled, to
  * separate "work" from AQE's per-stage driver round trips.
  * Usage: runMain graft.tools.ProbeJobs <queryName> [sfDir] [noaqe]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1 && !args(1).startsWith("no")) args(1)
      else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    // warm
    try mat(graft.SparkEntry.queries(name)(spark, dir)) finally clear()

    def timedRun(label: String): Unit = {
      clear()
      import scala.jdk.CollectionConverters._
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, js.time)
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.get(je.jobId)).foreach(t0 => jobs.put(je.jobId, je.time - t0))
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      mat(graft.SparkEntry.queries(name)(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[probejobs] $label: $sec%.2fs, ${js.size} jobs, " +
        f"job-time sum ${js.map(_._2).sum / 1e3}%.2fs")
      js.foreach { case (id, ms) => println(f"[job] $id%4d ${ms / 1e3}%6.2fs") }
    }
    timedRun("aqe-on")
    if (args.contains("noaqe")) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      timedRun("aqe-off")
    }
    spark.stop()
  }
}
