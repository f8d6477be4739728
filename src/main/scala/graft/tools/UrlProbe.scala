package graft.tools

import org.apache.spark.sql.SparkSession

/** URL-family expression-shape probe — the measurement that caught the
  * round-12 one-Column composition hazard: composing the canonicalizer
  * as a single Column re-embeds every upstream piece multiplicatively
  * (the raw synth appeared hundreds of times in the gate plan), so
  * janino paid SECONDS of codegen per query while the per-row work was
  * trivial. The staged [[graft.queries.WebQueries.withUrlParts]] chain
  * keeps each piece a named column evaluated once; this probe times the
  * two shapes side by side (gate went 8.5 s → 0.5 s warm at sf0.1).
  *
  * Kept as the regression tripwire for "cheap scan-shaped query is
  * mysteriously seconds-slow": if `gate x2` ever reads in seconds
  * again, someone reintroduced a composed Column on a corpus path.
  */
object UrlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, dir)
    val raw = graft.queries.WebQueries.rawUrlCol(col("doc_id"))
    t("warm scan")(noop(d.select(col("doc_id"))))
    t("raw only")(noop(d.select(raw.as("r"))))
    t("raw x2")(noop(d.select(raw.as("r"))))
    // the one-Column composition: fixture-sized frames only — codegen
    // cost, not row cost, is what these seconds are made of
    t("canon composed")(noop(
      d.select(graft.queries.WebQueries.canonicalize(raw).as("c"))))
    t("canon composed x2")(noop(
      d.select(graft.queries.WebQueries.canonicalize(raw).as("c"))))
    // the staged chain every corpus path uses
    t("canon staged")(noop(graft.queries.WebQueries
      .withUrlParts(d, raw).select(col("doc_id"), col("canon_url"))))
    t("canon staged x2")(noop(graft.queries.WebQueries
      .withUrlParts(d, raw).select(col("doc_id"), col("canon_url"))))
    val q = graft.SparkEntry.queries("url_quality_gate")(spark, dir)
    t("gate")(noop(q))
    t("gate x2")(noop(q))
    spark.stop()
  }
}
