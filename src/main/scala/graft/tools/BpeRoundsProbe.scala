package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: BPE trainer job/round counts on the documents fixture —
  * driver-local incremental path (default) vs distributed batched loop
  * (forced via maxDriverWords = 0), at several vocab targets. */
object BpeRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    Seq(12, 64, 256, 1024).foreach { k =>
      val t0 = System.nanoTime()
      val loc = graft.operators.BpeTrainer.train(docs, "text", k, minCount = 2L)
      val tLoc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val dist = graft.operators.BpeTrainer.train(docs, "text", k,
        minCount = 2L, maxDriverWords = 0L)
      val tDist = (System.nanoTime() - t1) / 1e9
      val same = loc.merges == dist.merges
      println(f"[bpe] merges=$k got=${loc.merges.size} same=$same " +
        f"local_rounds=${loc.rounds} local=${tLoc}%.1fs " +
        f"dist_rounds=${dist.rounds} dist=${tDist}%.1fs")
      graft.operators.LoopRdds.freeAll()
    }
    spark.stop()
  }
}
