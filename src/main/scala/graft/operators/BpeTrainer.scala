package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training over a document corpus — the
  * tokenizer-training step of a training-data pipeline, distributed the
  * way the data sizes demand at 100 TB:
  *
  *   - The corpus-sized pass is ONE scan: split every document into
  *     lowercase word tokens and aggregate `(word, count)`. Everything
  *     downstream operates on the word-frequency table, whose size is
  *     the number of DISTINCT words (bounded by vocabulary growth, not
  *     corpus size — a few million rows at web scale), so the merge loop
  *     never touches the corpus again. This is the same two-tier shape
  *     every production BPE trainer uses (word counts, then merges),
  *     with the count pass distributed.
  *   - Each merge round is two small shuffles over the word table: an
  *     adjacent-pair count (explode + groupBy + sum of word counts) and
  *     the merge application. The winning pair per round is a 1-row
  *     driver fetch — the same legitimate driver boundary as
  *     [[IvfIndex]]'s centroid update (O(numMerges) rows total).
  *   - Fully deterministic: exact integer counts, ties broken by
  *     (count desc, left asc, right asc) — so the merge table is
  *     reproducible on any cluster size.
  *
  * The per-word merge application is a Scala UDF over the symbol array.
  * That is a deliberate exception to the no-UDF rule: it runs on the
  * word TABLE (vocab-bounded), not the corpus, and adjacent-pair
  * rewriting is inherently sequential within a word — no composition of
  * built-in higher-order functions expresses "merge each non-overlapping
  * adjacent (a,b) left to right" without quadratic re-scans.
  */
object BpeTrainer {

  /** One learned merge: rank order, the pair, and its count when won. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  final case class Model(merges: Seq[Merge], wordCounts: DataFrame)

  /** The end-of-word marker: distinguishes "low</w>" (word-final) from
    * "low" mid-word — standard BPE (Sennrich et al. 2016) behavior. */
  val EndMark = "</w>"

  private val mergePair = udf { (syms: Seq[String], a: String, b: String) =>
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Lowercase word tokens of `textCol` — the one corpus-sized pass. */
  def wordCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(split(lower(col(textCol)), "[^\\p{L}]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence: characters, last one carrying [[EndMark]]. */
  private def initialSymbols(word: Column): Column = {
    val chars = split(word, "")
    val n = size(chars)
    transform(chars, (c, i) =>
      when(i === n - 1, concat(c, lit(EndMark))).otherwise(c))
  }

  /** The merge-chain truncation period: every `ChainTruncateEvery`
    * applied merges, the lazily-stacked word table is cut to a persisted
    * RDD (the [[ConnectedComponents]] lineage-truncation pattern), so a
    * round's pair-count job applies at most this many merge UDFs on top
    * of a materialized table instead of the full accumulated chain. At a
    * production 32-50k-merge vocabulary the untruncated form is a
    * quadratically deepening plan (round r re-derives all r predecessors:
    * O(k²·|vocab|) re-applied UDF work and an optimizer tree that grows
    * without bound); truncation bounds both at O(R·|vocab|) per round
    * with one extra persisted |vocab|-sized block per period, the
    * predecessor freed as soon as its successor materializes. */
  val ChainTruncateEvery = 64

  /** Learn `numMerges` merges from the corpus. `minCount` drops hapax
    * noise from the word table before the loop (standard practice; keeps
    * the iterated table small even on OCR-dirty corpora). */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L): Model = {
    val spark = corpus.sparkSession
    val base = wordCounts(corpus, textCol)
      .filter(col("cnt") >= minCount)
      .withColumn("syms", initialSymbols(col("word")))
      .persist()
    // ONE materialization per truncation period: each round's pair-count
    // job re-applies the ≤ChainTruncateEvery pending merge UDFs to the
    // last persisted cut lazily (vocab-local trivial CPU) instead of
    // persist()+count()-ing a new table per merge, which would cost a
    // second job and a full barrier every round. One job per round, plan
    // depth and re-derivation both bounded by the period.
    base.count()
    var words = base
    var lastCut: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var pendingMerges = 0
    def truncateChain(): Unit = {
      val rdd = words.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      words = spark.createDataFrame(rdd, words.schema)
      // materialize the new cut before releasing its predecessor (the
      // next round's job would otherwise recompute the full chain once
      // more from the freed blocks' lineage)
      words.count()
      if (lastCut != null) lastCut.unpersist(blocking = false)
      lastCut = rdd
      pendingMerges = 0
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    // AQE is suspended for the merge loop (the ConnectedComponents
    // argument): every round is the SAME two-stage plan — explode +
    // hash-agg + take-1 — over the cached vocab-bounded word table, so
    // adaptive re-planning only adds driver round-trip jobs to a loop
    // whose cost at any scale is the per-round scheduling floor times
    // numMerges. The corpus-sized word-count pass above already ran
    // under normal AQE.
    val spark0 = corpus.sparkSession
    val aqePrev = spark0.conf.getOption("spark.sql.adaptive.enabled")
    spark0.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    for (rank <- 0 until numMerges if !exhausted) {
      // adjacent pairs weighted by word count; slice drops the final
      // position (no right neighbor)
      val top = words
        .select(col("cnt"), col("syms"), posexplode(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))))
          .as(Seq("i", "a")))
        .withColumn("b", element_at(col("syms"), col("i") + 2))
        .groupBy("a", "b").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      // a top pair of count 1 can never help a tokenizer — stop early
      if (top.isEmpty || top(0).getLong(2) <= 1) { exhausted = true }
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        val n = top(0).getLong(2)
        merges += Merge(rank, a, b, n)
        words = words.withColumn("syms", mergePair(col("syms"), lit(a), lit(b)))
        pendingMerges += 1
        if (pendingMerges >= ChainTruncateEvery) truncateChain()
      }
    }
    } finally aqePrev match {
      case Some(v) => spark0.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark0.conf.unset("spark.sql.adaptive.enabled")
    }
    // the final cut (if any) outlives the call — the returned word table
    // reads it; harness code releases it via the LoopRdds registry
    if (lastCut != null) LoopRdds.register(lastCut)
    Model(merges.toSeq, words)
  }

  /** The learned subword vocabulary: every symbol surviving in the merged
    * word table, with its corpus frequency. */
  def vocab(m: Model): DataFrame =
    m.wordCounts
      .select(col("cnt"), explode(col("syms")).as("token"))
      .groupBy("token").agg(sum(col("cnt")).as("freq"))

  /** Tokenize `textCol` with a learned merge list: per word, repeatedly
    * merge all occurrences of the LOWEST-RANK pair present (the GPT-2
    * encode loop), until no pair is in the merge table. Row-local and
    * corpus-sized — the merge list (a few 10k pairs at real vocab sizes)
    * ships to executors inside the UDF closure, i.e. a broadcast-sized
    * model against a streaming corpus. Rank-order application reproduces
    * the training segmentation exactly for in-corpus words
    * (BpeTrainerSpec pins encode == trainer table on every word). */
  def encode(corpus: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val pairRank: Map[(String, String), Int] =
      merges.map(g => (g.left, g.right) -> g.rank).toMap
    val byRank: Map[Int, (String, String)] =
      merges.map(g => g.rank -> (g.left, g.right)).toMap
    val tokenize = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .flatMap { w =>
          val chars = w.map(_.toString).toVector
          var syms = chars.init :+ (chars.last + EndMark)
          var continue = true
          while (continue && syms.length > 1) {
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              pairRank.get((syms(i), syms(i + 1)))
                .foreach(r => if (r < best) best = r)
              i += 1
            }
            if (best == Int.MaxValue) continue = false
            else {
              val (a, b) = byRank(best)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                  out += (a + b); j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.toVector
            }
          }
          syms
        }.toSeq
    }
    corpus.withColumn("tokens", tokenize(col(textCol)))
  }
}
