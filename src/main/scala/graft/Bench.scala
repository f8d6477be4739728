package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology (JMH-style): one untimed pass over every
    // query first, so the timed pass measures execution, not one-shot JVM
    // bootstrap — janino compilation of each stage's generated code,
    // first-touch classloading of operator classes (window exec, broadcast
    // exchange, generators), and parquet footer reads. That warm regime is
    // the one a long-lived cluster actually runs in: plans are re-planned
    // per query here (nothing is result-cached — every timed run scans the
    // parquet and recomputes), but code and metadata caches are hot.
    // optional dev-only subset filter (the driver never sets it)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val bench = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Materialization sink: the noop DataSource v2 writer consumes every
    // output row in full. A `count()` here would let Catalyst prune the
    // very work being measured — ColumnPruning drops all projected
    // expressions count(1) doesn't need and EliminateSorts removes the
    // final ORDER BY, so projection-shaped operators (fingerprints,
    // slugs, signatures) would time as bare parquet row-count scans.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    bench.foreach { case (_, fn) =>
      // warmup honors the Q contract too: clear persisted stages between
      // queries, or identical subplans (the LSH stage feeds four queries)
      // get served from another query's cache and never JIT-warm
      spark.catalog.clearCache()
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // Per query: best of three timed runs. Single-run timings on a shared
    // box swing ±40% from GC pauses and scheduler jitter; min-of-N is the
    // standard way to report the repeatable cost. Every timed run starts
    // from a cleared cache — queries persist() internal stages, and the
    // CacheManager matches them by logical-plan equality, so without the
    // clear a timed run would read a previous run's materialized data
    // instead of recomputing. A query that THROWS reports -1 (never a
    // fast-looking time-to-exception): a regression must surface as a
    // failure marker in the bench JSON, not as an "improvement".
    val results = bench.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
