package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scale rehearsal (VERDICT r7 task #1): run the heavy operator
  * families at sf0.1 and at the ScaleUp 10× fixture in ONE JVM and report
  * the runtime ratio per query, normalized by the inflation factor.
  *
  * Methodology mirrors Bench exactly — untimed warm pass per (query, dir)
  * to JIT/janino-warm the generated code, then min-of-3 timed runs from a
  * cleared cache with a GC settle — so the ratio cancels the shared-JVM
  * constants Bench's inflation_note documents. A ratio/factor near 1.0 is
  * measured linearity; materially above 1.0 is super-linear growth the
  * SCALE.md argument would have to answer for.
  *
  * Usage: ScaleRehearsal [baseDir] [scaledDir] [factor] [q1,q2,...]
  */
object ScaleRehearsal {
  val HeavyDefault: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_semantic",
    "dedup_cluster_cc", "text_contamination", "curation_pipeline_full",
    "graph_pagerank", "bpe_encode",
    "ann_lsh_knn", "ann_ivf_knn", "ann_int8_knn")

  def main(args: Array[String]): Unit = {
    val base   = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scaled = args.lift(1).getOrElse("/root/repo/scale10")
    val factor = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val names  = args.lift(3).map(_.split(",").toSeq).getOrElse(HeavyDefault)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // a fixed partition count is the one knob that CANNOT stay fixed
      // across a 100× inflation (a real cluster sizes it with the data);
      // overridable so scale points can be measured at a data-appropriate
      // parallelism as well as at the harness default
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      // opt-in zstd for fifth-decade readings whose spill exceeds the
      // box's disk under lz4 (dedup_substring_maximal at 50M docs shuffles
      // every positional gram once; zstd roughly halves the on-disk spill
      // at a small CPU cost — applied to BOTH sides of the ratio, so the
      // slope stays internally consistent)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      spark.catalog.clearCache()
      graft.operators.ConnectedComponents.freeAll()
      System.gc(); Thread.sleep(30)
    }
    // timed-run count: 3 for the default sub-10s queries; drop to 2 via
    // env for multi-minute 100x readings where run-to-run variance is
    // already small relative to the measured time
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt
    // warm pass skippable for multi-minute fifth-decade readings, where
    // JIT/janino warmup is noise against the measured minutes and the
    // extra full pass would double the measurement's wall-clock
    val warm = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM", "1") != "0"
    def time(name: String, dir: String): Double = {
      val fn = qs(name)
      if (warm) {
        reset(); try materialize(fn(spark, dir)) catch { case _: Throwable => () }
      }
      val runs = (1 to nRuns).map { _ =>
        reset()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, dir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"$name@$dir FAILED: ${e.getMessage}"); -1.0 }
      }
      if (runs.exists(_ < 0)) -1.0 else runs.min
    }

    val rows = names.filter(qs.contains).map { n =>
      val tBase   = time(n, base)
      val tScaled = time(n, scaled)
      val ratio   = if (tBase > 0 && tScaled > 0) tScaled / tBase else -1.0
      val norm    = if (ratio > 0) ratio / factor else -1.0
      println(f"| `$n` | $tBase%.2f | $tScaled%.2f | ${ratio}%.2f | ${norm}%.2f |")
      (n, tBase, tScaled, ratio, norm)
    }
    val json = rows.map { case (n, b, s, r, nn) =>
      f""""$n":{"base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":$r%.3f,"ratio_over_factor":$nn%.3f}"""
    }.mkString("{", ",", "}")
    val line = s"""{"factor":$factor,"base":"$base","scaled":"$scaled","queries":$json}"""
    // JSONL, appended: each line is one (base, scaled) measurement pair,
    // so successive scale points (sf0.1→10×, 10×→100×) accumulate
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_REHEARSAL.json"),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }
    println("SCALE_REHEARSAL " + line)
    spark.stop()
  }
}
