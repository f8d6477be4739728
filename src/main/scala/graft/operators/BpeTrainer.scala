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
  *   - Each merge ROUND is one small job over the word table: an
  *     adjacent-pair count (explode + groupBy + sum of word counts)
  *     whose top-[[BatchCollect]] rows come back to the driver — the
  *     same legitimate bounded driver boundary as [[IvfIndex]]'s
  *     centroid update — and a round applies a whole BATCH of
  *     mutually-non-conflicting merges in one pass (see
  *     [[selectBatch]]), so the job count is O(rounds), not O(vocab):
  *     a production 32-50k-merge vocabulary costs hundreds of jobs
  *     instead of tens of thousands, removing the per-merge scheduling
  *     floor that dominates at production vocabulary sizes while
  *     producing a merge table byte-identical to the sequential loop's.
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

  /** `rounds` is the number of driver-looped Spark jobs the merge loop
    * ran — with batching (see [[train]]) this is far below
    * `merges.size`, which is the scale story: the scheduling floor of a
    * 32-50k-vocab training run is O(rounds), not O(merges). */
  final case class Model(merges: Seq[Merge], wordCounts: DataFrame,
      rounds: Int = 0)

  /** The end-of-word marker: distinguishes "low</w>" (word-final) from
    * "low" mid-word — standard BPE (Sennrich et al. 2016) behavior. */
  val EndMark = "</w>"

  /** Apply a BATCH of mutually symbol-disjoint merges in one pass. With
    * no two batch pairs sharing a symbol, their occurrences cannot
    * overlap within a word, so a single left-to-right non-overlapping
    * scan is exactly equivalent to applying the merges one at a time in
    * rank order (the sequential Sennrich semantics) — and the scan never
    * re-examines its own output, so a merge's freshly created symbol is
    * never re-merged within the same round, matching the sequential
    * order in the string-collision case too (a batch pair involving a
    * symbol string equal to another member's merged output is rejected
    * at selection time). */
  private def applyBatch(pairs: Seq[(String, String)]) = {
    val m: Map[(String, String), String] =
      pairs.map { case (a, b) => (a, b) -> (a + b) }.toMap
    udf { (syms: Seq[String]) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        val merged =
          if (i + 1 < syms.length) m.get((syms(i), syms(i + 1))) else None
        if (merged.isDefined) { out += merged.get; i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
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

  /** Word-table row bound under which the merge loop runs ON THE DRIVER
    * over the collected `(word, cnt, syms)` table — the two-tier shape
    * every production BPE trainer uses (the corpus-sized count pass is
    * distributed; the merge loop is an in-memory incremental algorithm
    * over the vocab-bounded model table, the same driver-model boundary
    * as [[IvfIndex]] centroids, here ~100 MB at the bound). This removes
    * the per-round Spark-job scheduling floor entirely: training cost
    * beyond the count pass is O(merge work), not O(rounds × job floor).
    * Corpora whose distinct-word table exceeds the bound fall back to
    * the distributed batched loop below — and in practice production
    * tokenizers train on a bounded SAMPLE of the corpus (sentencepiece
    * caps input sentences), which keeps the word table under a driver
    * bound by construction. */
  val DriverVocabLimit: Long = 1L << 20

  /** Learn `numMerges` merges from the corpus. `minCount` drops hapax
    * noise from the word table before the loop (standard practice; keeps
    * the iterated table small even on OCR-dirty corpora).
    * `maxDriverWords` gates the in-memory merge loop (see
    * [[DriverVocabLimit]]); both paths produce byte-identical merge
    * tables (BpeTrainerSpec pins each against the scalar reference). */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L,
      maxDriverWords: Long = DriverVocabLimit): Model = {
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
    val tableRows = base.count()
    if (tableRows <= maxDriverWords) {
      val m = trainLocal(spark, base, numMerges)
      base.unpersist(blocking = false)
      return m
    }
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
    var rounds = 0
    // AQE is suspended for the merge loop (the ConnectedComponents
    // argument): every round is the SAME two-stage plan — explode +
    // hash-agg + top-K — over the cached vocab-bounded word table, so
    // adaptive re-planning only adds driver round-trip jobs to a loop
    // whose cost at any scale is the per-round scheduling floor times
    // the round count. The corpus-sized word-count pass above already
    // ran under normal AQE. NOTE: the conf toggle mutates the SHARED
    // session non-atomically — the harness contract is one driver-side
    // loop per session at a time (run concurrent queries, e.g. a live
    // REST server, on spark.newSession() so each has its own conf).
    val spark0 = corpus.sparkSession
    val aqePrev = spark0.conf.getOption("spark.sql.adaptive.enabled")
    spark0.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    while (merges.size < numMerges && !exhausted) {
      rounds += 1
      // adjacent pairs weighted by word count; slice drops the final
      // position (no right neighbor). ONE job per ROUND, and one round
      // applies a whole batch of merges (selected below), so a 32-50k
      // vocab costs O(hundreds) of jobs, not O(vocab) — the scheduling
      // floor the sequential per-merge loop would hit at production
      // vocabulary sizes.
      val top = words
        .select(col("cnt"), col("syms"), posexplode(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))))
          .as(Seq("i", "a")))
        .withColumn("b", element_at(col("syms"), col("i") + 2))
        .groupBy("a", "b").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(BatchCollect).collect()
      // a top pair of count 1 can never help a tokenizer — stop early
      if (top.isEmpty || top(0).getLong(2) <= 1) { exhausted = true }
      else {
        val cands = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val batch = selectBatch(cands, haveAll = top.length < BatchCollect,
          maxSize = numMerges - merges.size)
        if (batch.head._3 <= 1L) { exhausted = true }
        else {
          batch.foreach { case (a, b, n) =>
            merges += Merge(merges.size, a, b, n)
          }
          words = words.withColumn("syms",
            applyBatch(batch.map(p => (p._1, p._2)))(col("syms")))
          pendingMerges += batch.size
          if (pendingMerges >= ChainTruncateEvery) truncateChain()
        }
      }
    }
    } finally {
      aqePrev match {
        case Some(v) => spark0.conf.set("spark.sql.adaptive.enabled", v)
        case None    => spark0.conf.unset("spark.sql.adaptive.enabled")
      }
      // the final cut (if any) outlives the call on success — the
      // returned word table reads it; harness code releases it via the
      // LoopRdds registry. Registering in the finally also covers the
      // exception path (a cancelled job mid-loop), so freeAll() can
      // always reclaim the persisted blocks instead of leaking them.
      if (lastCut != null) LoopRdds.register(lastCut)
    }
    Model(merges.toSeq, words, rounds)
  }

  /** The in-memory merge loop over the collected word table: incremental
    * pair-count maintenance (only words containing the winning pair are
    * touched, found via an inverted pair→words index) plus a
    * lazy-deletion priority queue ordered (count desc, pair asc) — the
    * textbook incremental BPE trainer, exactly the algorithm inside
    * sentencepiece/HF. Total work is O(occurrences touched · log heap),
    * independent of any per-job scheduling floor. Byte-identical output
    * to the distributed loop: same exact integer counts, same
    * (count desc, left asc, right asc) tie-break (heap order + stale
    * filtering), same left-to-right non-overlapping application. */
  private def trainLocal(spark: org.apache.spark.sql.SparkSession,
      base: DataFrame, numMerges: Int): Model = {
    val rows = base.select("word", "cnt", "syms").collect()
    val wordStr = rows.map(_.getString(0))
    val cnts = rows.map(_.getLong(1))
    val words: Array[Array[String]] =
      rows.map(_.getSeq[String](2).toArray)
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.BitSet]
    def occurrences(syms: Array[String]): scala.collection.mutable.HashMap[(String, String), Long] = {
      val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        m.update(p, m.getOrElse(p, 0L) + 1L)
        i += 1
      }
      m
    }
    // max-heap: highest count first, then LEFT asc, RIGHT asc — so the
    // head is exactly the sequential loop's (count desc, pair asc) pick
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord)
    var wi = 0
    while (wi < words.length) {
      occurrences(words(wi)).foreach { case (p, k) =>
        pairCount.update(p, pairCount.getOrElse(p, 0L) + k * cnts(wi))
        pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += wi
      }
      wi += 1
    }
    pairCount.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // lazy deletion: discard heap entries whose count is stale
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCount.get((e._2, e._3)).contains(e._1)) top = Some(e)
      }
      top match {
        case Some((n, a, b)) if n > 1L =>
          merges += Merge(merges.size, a, b, n)
          val touched = pairWords.getOrElse((a, b),
            scala.collection.mutable.BitSet.empty).toArray
          touched.foreach { w =>
            val before = occurrences(words(w))
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            val syms = words(w)
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            words(w) = out.toArray
            val after = occurrences(words(w))
            (before.keySet ++ after.keySet).foreach { p =>
              val delta = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
              if (delta != 0L) {
                val nc = pairCount.getOrElse(p, 0L) + delta * cnts(w)
                if (nc <= 0L) pairCount.remove(p)
                else {
                  pairCount.update(p, nc)
                  heap.enqueue((nc, p._1, p._2))
                }
              }
              if (after.getOrElse(p, 0L) == 0L)
                pairWords.get(p).foreach(_ -= w)
              else
                pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += w
            }
          }
        case _ => exhausted = true
      }
    }
    val schema = base.select("word", "cnt", "syms").schema
    val outRows = wordStr.indices.map(i =>
      org.apache.spark.sql.Row(wordStr(i), cnts(i), words(i).toSeq))
    val wordsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1), schema)
    // one Spark job total (the collect) — the merge loop itself is
    // driver-local, so the scheduling floor is gone
    Model(merges.toSeq, wordsDf, rounds = 1)
  }

  /** Rows collected per round for batched merge selection: the driver
    * sees the top `BatchCollect` pairs by (count desc, pair asc) — a
    * bounded driver boundary of the same kind as the old 1-row fetch,
    * just wider (≤256 KB of strings at realistic symbol sizes). */
  val BatchCollect = 4096

  /** Select the longest PREFIX of the (count desc, pair asc)-ordered
    * candidate list that sequential BPE would provably pick in exactly
    * that order, so the whole prefix can be applied in one job with the
    * merge table byte-identical to the per-merge loop's.
    *
    * A candidate extends the batch only if, at its sequential turn
    * (after all earlier batch members are applied), nothing can outrank
    * it:
    *   - it shares no symbol with any earlier member (disjoint merges
    *     cannot overlap, so every earlier member zeroes its own pair
    *     count and leaves the candidate's count — and every other
    *     disjoint pair's — unchanged);
    *   - neither of its symbols IS an earlier member's merged string
    *     (such a pair's count can RISE when the earlier merge creates
    *     new occurrences of that symbol);
    *   - every pair a previous member's application can create or grow
    *     has a count upper bound that either stays strictly below the
    *     candidate's count, or ties and loses the (pair asc) tie-break.
    *     Created pairs are enumerable from the candidate table: merging
    *     (a,b)→ab creates (x,ab) bounded by count(x,a), (ab,y) bounded
    *     by count(b,y), (ab,ab) bounded by count(b,a), cross-member
    *     (e1e2, ab) bounded by count(e2,a) (and symmetrically), each
    *     plus the prior count of any existing pair spelled identically.
    * The scan stops at the first reject — skipping would reorder picks
    * whose counts sequential BPE recomputes. `haveAll=false` means the
    * table was truncated at [[BatchCollect]]; pairs below the cut are
    * bounded by the last collected count and their identities are
    * unknown, so candidates must strictly clear twice that floor.
    * BpeTrainerSpec pins batched == scalar-sequential on every fixture,
    * including the 256-merge truncation-crossing run. */
  private[graft] def selectBatch(
      cands: Array[(String, String, Long)], haveAll: Boolean,
      maxSize: Int): Seq[(String, String, Long)] = {
    val cnt: Map[(String, String), Long] =
      cands.map { case (a, b, n) => (a, b) -> n }.toMap
    val floor = if (haveAll) 0L else cands.last._3
    def existing(p: (String, String)): Long = cnt.getOrElse(p, floor)
    def pairLt(p: (String, String), q: (String, String)): Boolean =
      p._1 < q._1 || (p._1 == q._1 && p._2 < q._2)
    val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    val mergedSyms = scala.collection.mutable.Set.empty[String]
    // pairs a batch member's application can create or grow, with a
    // count upper bound for each — checked against later candidates
    val possible = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    val unknownFloor = if (haveAll) 0L else 2L * floor
    var stop = false
    var ci = 0
    while (!stop && ci < cands.length && batch.size < maxSize) {
      val (a, b, n) = cands(ci)
      val ok = batch.isEmpty || (
        n > 1L && !used(a) && !used(b) && !mergedSyms(a) && !mergedSyms(b) &&
        n > unknownFloor &&
        possible.forall { case (q, bound) =>
          bound < n || (bound == n && pairLt((a, b), q)) })
      if (!ok) stop = true
      else {
        val ab = a + b
        cands.foreach { case (pa, pb, pn) =>
          if (pb == a)
            possible += ((pa, ab) -> (math.min(pn, n) + existing((pa, ab))))
          if (pa == b)
            possible += ((ab, pb) -> (math.min(pn, n) + existing((ab, pb))))
        }
        cnt.get((b, a)).foreach(m =>
          possible += ((ab, ab) -> (math.min(m, n) + existing((ab, ab)))))
        batch.foreach { case (ea, eb, en) =>
          val eab = ea + eb
          cnt.get((eb, a)).foreach(m =>
            possible += ((eab, ab) ->
              (math.min(math.min(m, n), en) + existing((eab, ab)))))
          cnt.get((b, ea)).foreach(m =>
            possible += ((ab, eab) ->
              (math.min(math.min(m, n), en) + existing((ab, eab)))))
        }
        used += a; used += b; mergedSyms += ab
        batch += ((a, b, n))
      }
      ci += 1
    }
    batch.toSeq
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
    // Per-task word→segmentation memo (r14 optimization, guide §4.5
    // amortized-state pattern): word streams are Zipf-distributed, so one
    // hash probe replaces the whole merge loop for every repeated word.
    // The empty map is serialized into the closure and deserialized once
    // per task — single-threaded within the task, never shared across
    // tasks. Capped so an unbounded vocabulary degrades to the uncached
    // path instead of growing executor heap.
    val memoCap = 1 << 16
    val memo = new java.util.HashMap[String, Seq[String]]()
    // a function VALUE, not a local def: a def lowers to a method on the
    // enclosing object and would drag non-serializable BpeTrainer$ into
    // the closure; the lambda captures only serializable locals
    val endMark = EndMark
    val encodeWord: String => Seq[String] = { w =>
      val chars = w.map(_.toString).toVector
      var syms = chars.init :+ (chars.last + endMark)
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
    }
    val tokenize = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.toLowerCase.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .flatMap { w =>
          val cached = memo.get(w)
          if (cached != null) cached
          else {
            val syms = encodeWord(w)
            if (memo.size < memoCap) memo.put(w, syms)
            syms
          }
        }.toSeq
    }
    corpus.withColumn("tokens", tokenize(col(textCol)))
  }
}
