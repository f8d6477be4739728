package graft.tools
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

object ObsProbe {
  private def read(o: Observation): String =
    try Await.result(Future(o.get), 10.seconds).toString
    catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // empty right side of a left_anti join: does the CollectMetrics
    // node survive AQE's empty-relation propagation?
    val left = spark.range(100).withColumnRenamed("id", "k")
    val oEmpty = Observation()
    val right = spark.range(50).withColumnRenamed("id", "k")
      .filter(col("k") < -1)   // empty
      .observe(oEmpty, count(lit(1)).as("nc"))
    val j = left.join(right, Seq("k"), "left_anti")
    println(s"[obs] anti-join count=${j.count()}")
    println(s"[obs] empty-anti-right: ${read(oEmpty)}")
    // non-empty right side
    val oNe = Observation()
    val right2 = spark.range(50).withColumnRenamed("id", "k")
      .filter(col("k") < 10).observe(oNe, count(lit(1)).as("nc"))
    val j2 = left.join(right2, Seq("k"), "left_anti")
    println(s"[obs] anti2 count=${j2.count()}")
    println(s"[obs] nonempty-anti-right: ${read(oNe)}")
    spark.stop()
  }
}
