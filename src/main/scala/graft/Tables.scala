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
  /** `events.ts` has shipped as both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations. Nanos parquet is
    * rejected by Spark's reader outright, so it is read as raw longs
    * (legacy conf) and integer-divided to microseconds — the same
    * truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP. Micros
    * parquet arrives as TIMESTAMP_NTZ and only needs the cast to the
    * session-UTC TimestampType every downstream query expects (the
    * session timezone is pinned to UTC in every entry point, so the cast
    * is wall-clock-preserving and value-identical to DuckDB's read). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    df.withColumn("ts", ts)
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
