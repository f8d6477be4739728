package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-query job accounting across a list of registry
  * queries — wall seconds, job count, and summed job time for one warm
  * timed run each. A job-time sum well ABOVE wall means concurrent
  * duplicate work (usually an unpersisted frame re-run by broadcast
  * builds); a wall well above job-time sum means driver-side cost
  * (planning, construction-time loops).
  * Usage: runMain graft.tools.ProbeSweep <q1,q2,...|top:N> [sfDir]
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
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
    import scala.jdk.CollectionConverters._
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      clear(); try mat(fn(spark, dir)) finally clear() // warm
      System.gc(); Thread.sleep(30)
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
      mat(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      spark.sparkContext.removeSparkListener(listener)
      val sum = jobs.asScala.values.sum / 1e3
      println(f"[sweep] $name%-28s wall=$wall%6.2fs jobs=${jobs.size}%3d jobsum=$sum%6.2fs ratio=${sum / wall}%4.2f")
      clear()
    }
    spark.stop()
  }
}
