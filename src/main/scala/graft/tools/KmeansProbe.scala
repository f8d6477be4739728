package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the k-means-blocked dedup family: cluster occupancy and
  * the within-cluster candidate-pair count Σ C(m,2) per fixture — the
  * decomposition to read BEFORE believing any surprising
  * dedup_semantic_kmeans scale ratio (the LshProbe discipline: a
  * pair-generating query's cost is its candidate count, so explain the
  * candidates, then the seconds).
  *
  * Usage: KmeansProbe [dir1] [dir2] ...
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scale10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val emb = graft.Tables.embeddings(spark, dir)
        .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      val t0 = System.nanoTime()
      val a = graft.operators.KmeansOps.fit(emb, "vec_id", "embedding", 64, 8, 2)._1
      val sizes = a.groupBy("cluster").count().orderBy("cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val fitS = (System.nanoTime() - t0) / 1e9
      val n = sizes.map(_._2).sum
      val candPairs = sizes.map(_._2).map(m => m * (m - 1) / 2).sum
      println(f"KMPROBE dir=$dir n=$n fit=$fitS%.2fs candPairs=$candPairs " +
        s"sizes=${sizes.map { case (c, m) => s"$c:$m" }.mkString(",")}")
      spark.catalog.clearCache()

      // brute vs routed assignment at the adaptive-k operating point —
      // the large-k regime assignedRouted exists for
      import graft.operators.KmeansOps
      val k = KmeansOps.adaptiveK(n)
      val (_, model) = KmeansOps.fit(emb, "vec_id", "embedding", 64, k, rounds = 2)
      val q = emb.select(col("vec_id"), KmeansOps.quantized(col("embedding")).as("qv"))
        .persist()
      q.count()
      def time(f: => Unit): Double = {
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      // warm both, then min-of-2
      noop(KmeansOps.assigned(q, model)); noop(KmeansOps.assignedRouted(q, model))
      val brute = (1 to 2).map(_ => time(noop(KmeansOps.assigned(q, model)))).min
      val routed = (1 to 2).map(_ => time(noop(KmeansOps.assignedRouted(q, model)))).min
      println(f"KMROUTE dir=$dir n=$n k=$k brute=$brute%.2fs routed=$routed%.2fs " +
        f"speedup=${brute / routed}%.1fx")
      q.unpersist()
      spark.catalog.clearCache()
    }
  }
}
