package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps the `.explain("formatted")` output of the named queries into
  * per-query files (`<outDir>/<name>_<suffix>.txt`) — the optimization
  * rounds' before/after plan evidence.
  * Usage: runMain graft.tools.DumpPlanFiles <suffix> <q1,q2,...> [sfDir] [outDir]
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlanFiles <suffix> <q1,q2,...> [sfDir] [outDir]")
    val suffix = args(0)
    val names = args(1).split(",").toSeq
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 3) args(3) else "plans/r14"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"[planfile] $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
      graft.operators.ConnectedComponents.freeAll()
    }
    spark.stop()
  }
}
