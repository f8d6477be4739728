package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every query entry point receives an `sfDir` (e.g. /root/testdata/sf0.01)
  * and reads one parquet file per table. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; no caching
  * here — callers own persistence decisions.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    * rejects outright. Read it as raw nanos (legacy conf) and convert to
    * TimestampType by integer-dividing to microseconds — same truncation
    * DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** `documents`, redistributed across every core before heavy per-document
    * compute (shingling, hashing, signatures). The test corpus is a single
    * small parquet file with one row group — one input split — which would
    * otherwise serialize all per-doc CPU work onto a single thread. The
    * round-robin shuffle moves only the raw ~300-byte texts once and buys
    * full-cluster parallelism for everything downstream. A production
    * corpus arrives as many files/row-groups and already has this property;
    * the repartition is then a near-no-op but stays the right default ahead
    * of CPU-dense stages whose input splits may be few or skewed. */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
