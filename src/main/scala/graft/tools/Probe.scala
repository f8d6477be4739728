package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main: time one registry query and dump its formatted plan.
  * Repeated runs separate the fixed planning/codegen cost (run 1) from the
  * steady-state execution cost (later runs).
  * Usage: runMain graft.tools.Probe <queryName> [sfDir] [reps] [noplan] */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = args.drop(2).collectFirst {
      case a if a.forall(_.isDigit) && a.nonEmpty => a.toInt
    }.getOrElse(1)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("PROBE_CONSTRAINTS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!args.contains("noplan"))
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] $name run=$r rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
