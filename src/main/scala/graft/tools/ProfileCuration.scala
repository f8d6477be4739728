package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of curation_pipeline_full (mirrors
  * the registry query; keep in sync when editing PipelineQueries). Each
  * stage is materialized with the same noop sink Bench uses, so the
  * printed seconds attribute the full pass's cost to its stages. */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val g0 = gcMillis
      val r = f
      val heapUsed = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage.getUsed / (1 << 20)
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"(gc ${(gcMillis - g0) / 1e3}%.2fs, heap ${heapUsed}MB)")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm pass: full registry query once, so codegen/classloading are hot
    time("warm full query")(mat(
      graft.SparkEntry.queries("curation_pipeline_full")(spark, dir)))
    spark.catalog.clearCache()
    graft.operators.ConnectedComponents.freeAll()

    val base = graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val bench = base.filter(col("doc_id") < 3)
      .select(explode(graft.functions.HashedShinglesFunctions
        .hashedShingles(col("toks"), 3)).as("g3"))
      .distinct()
    // round-7 registry shape: quality persists WITH the repetition flag
    // (funnel sharing); candidates = the flag filter on the cache
    val st = graft.functions.GramStats.gramStats(col("toks"), 2)
    val quality = base.filter(col("doc_id") >= 3)
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"))
      .filter(col("n_tok") >= 20 &&
        col("n_uniq").cast("double") / col("n_tok").cast("double") >= 0.15)
      .withColumn("st", st)
      .withColumn("r_ok", col("st.dup_c").cast("double")
        / col("st.n_grams").cast("double") <= 0.2)
      .select(col("doc_id"), col("text"), col("toks"), col("r_ok"))
      .persist()
    val candidates = quality.filter(col("r_ok"))
    time("1 gates->quality persist")(quality.count())

    val contaminated = candidates
      .select(col("doc_id"), graft.functions.HashedShinglesFunctions
        .hashedShingles(col("toks"), 3).as("gr"))
      .select(col("doc_id"), size(col("gr")).cast("long").as("ng"),
        explode(col("gr")).as("g3"))
      .join(broadcast(bench), Seq("g3"))
      .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("nh"))
      .filter(col("nh").cast("double") / col("ng").cast("double") >= 0.1)
      .select("doc_id")
    val gated = candidates.join(contaminated, Seq("doc_id"), "left_anti")
    val exact = gated
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("toks"))
      .persist()
    time("2 contamination+exact persist")(exact.count())

    val (staged, cand) = graft.queries.TextOpsQueries.lshStage(exact)
    time("3 lsh staged persist")(staged.count())
    time("4 lsh candidates")(mat(cand))
    val pairs = graft.queries.TextOpsQueries.lshVerifiedPairs(staged, cand, 0.8)
      .select("a_id", "b_id")
    time("5 verified pairs")(mat(pairs))
    val dropSet = graft.operators.ConnectedComponents.dropSet(pairs)
    time("6 cc dropSet")(mat(dropSet))
    time("7 final anti-join+sort")(mat(
      exact.select(col("doc_id"))
        .join(dropSet, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))))

    spark.catalog.clearCache()
    graft.operators.ConnectedComponents.freeAll()
    // job-level attribution of the composed run
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name)
          .filterNot(_.contains("withThreadLocalCaptured"))
        val tag = if (names.nonEmpty) names.mkString(" | ")
          else js.stageInfos.map(_.details.split("\n")
            .find(l => l.contains("graft.") && !l.contains("ProfileCuration"))
            .getOrElse("").trim).distinct.mkString(" | ")
        starts.put(js.jobId, (js.time, tag.take(200)))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          jobs.put(je.jobId, (je.time - t0, desc)) }
    }
    spark.sparkContext.addSparkListener(listener)
    time("full query (re-run, cleared cache)")(mat(
      graft.SparkEntry.queries("curation_pipeline_full")(spark, dir)))
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (ms, desc)) =>
      println(f"[job] $id%3d ${ms / 1e3}%6.2fs  ${desc.take(90)}") }

    // variant: same composite but each persisted stage is eagerly
    // materialized before its self-join/multi-branch consumers, so
    // concurrent plan branches can't race the cache population
    spark.catalog.clearCache()
    graft.operators.ConnectedComponents.freeAll()
    time("variant: eager persists") {
      val base2 = graft.Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      val bench2 = base2.filter(col("doc_id") < 3)
        .select(explode(graft.functions.HashedShinglesFunctions
          .hashedShingles(col("toks"), 3)).as("g3"))
        .distinct()
      val quality2 = base2.filter(col("doc_id") >= 3)
        .select(col("doc_id"), col("text"), col("toks"),
          size(col("toks")).cast("long").as("n_tok"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"))
        .filter(col("n_tok") >= 20 &&
          col("n_uniq").cast("double") / col("n_tok").cast("double") >= 0.15)
      val cand2 = quality2
        .withColumn("st", st)
        .filter(col("st.dup_c").cast("double")
          / col("st.n_grams").cast("double") <= 0.2)
        .drop("st")
        .persist()
      cand2.count()
      val contaminated2 = cand2
        .select(col("doc_id"), graft.functions.HashedShinglesFunctions
          .hashedShingles(col("toks"), 3).as("gr"))
        .select(col("doc_id"), size(col("gr")).cast("long").as("ng"),
          explode(col("gr")).as("g3"))
        .join(broadcast(bench2), Seq("g3"))
        .groupBy(col("doc_id"), col("ng")).agg(count(lit(1)).as("nh"))
        .filter(col("nh").cast("double") / col("ng").cast("double") >= 0.1)
        .select("doc_id")
      val gated2 = cand2.join(contaminated2, Seq("doc_id"), "left_anti")
      val exact2 = gated2
        .withColumn("fp", fingerprint(col("text")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("toks"))
        .persist()
      exact2.count()
      val (staged2, lshCand2) = graft.queries.TextOpsQueries.lshStage(exact2)
      staged2.count()
      val pairs2 = graft.queries.TextOpsQueries
        .lshVerifiedPairs(staged2, lshCand2, 0.8)
        .select("a_id", "b_id")
      mat(exact2.select(col("doc_id"))
        .join(graft.operators.ConnectedComponents.dropSet(pairs2),
          Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id")))
    }
    spark.stop()
  }
}
