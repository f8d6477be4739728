package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV, JSON-lines, ORC and
  * text round-trips with explicit schemas (no inference in production
  * paths), compression, and partitioned layout + partition pruning. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10.5, "2024-01-01"),
    (2L, "beta", -3.25, "2024-01-02"),
    (3L, "gamma, with comma", 0.0, "2024-01-02"))
    .toDF("id", "name", "score", "day")

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("day", StringType)))

  private def sortedRows(d: org.apache.spark.sql.DataFrame) =
    d.select("id", "name", "score", "day").orderBy("id").collect().toSeq

  test("csv round trip: header, quoting, explicit schema, gzip") {
    val p = tmpDir("src-csv")
    df.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(p)
    val back = spark.read.schema(schema).option("header", "true").csv(p)
    assert(sortedRows(back) == sortedRows(df))
  }

  test("json-lines round trip with explicit schema") {
    val p = tmpDir("src-json")
    df.write.mode("overwrite").json(p)
    val back = spark.read.schema(schema).json(p)
    assert(sortedRows(back) == sortedRows(df))
  }

  test("orc round trip with zstd") {
    val p = tmpDir("src-orc")
    df.write.mode("overwrite").option("compression", "zstd").orc(p)
    val back = spark.read.orc(p)
    assert(sortedRows(back) == sortedRows(df))
  }

  test("text sink/source round trip") {
    val p = tmpDir("src-text")
    df.select(concat_ws("|", col("id"), col("name")).as("value"))
      .write.mode("overwrite").text(p)
    val back = spark.read.text(p)
      .select(split(col("value"), "\\|").getItem(0).cast("long").as("id"))
    assert(back.orderBy("id").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("partitioned parquet write prunes partitions on read") {
    val p = tmpDir("src-part")
    df.write.mode("overwrite").partitionBy("day").parquet(p)
    val pruned = spark.read.parquet(p).filter(col("day") === "2024-01-02")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not survive as a post-filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-02"), s"no partition pruning in:\n$plan")
  }
}
