package graft.tools

import org.apache.spark.sql.SparkSession

/** One timed end-to-end run of dedup_semantic_kmeans against a scale
  * fixture (the query's brute adaptive-k fit is deliberate — it is the
  * oracle shape — so a full ScaleRehearsal warm+min-of-N at the 2M-vector
  * decade costs ~20 min; a single honest run with the one-off JIT floor
  * disclosed is the right trade there). */
object SemKmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/scale1000")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("dedup_semantic_kmeans")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"SEMKM dir=$dir sec=$t%.1f (single run, includes JIT floor)")
  }
}
