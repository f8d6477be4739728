package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference BPE (Sennrich et al. 2016 shape): per-position
    * adjacent-pair counts weighted by word frequency, left-to-right
    * non-overlapping merge application, (count desc, pair asc) tie-break,
    * stop when the best pair's count is <= 1. */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var tbl: Map[Vector[String], Long] = words.map { case (w, c) =>
      val chars = w.map(_.toString).toVector
      (chars.init :+ (chars.last + BpeTrainer.EndMark)) -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n > 1 =>
          out += ((a, b, n))
          tbl = tbl.map { case (syms, c) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector -> c
          }
        case _ => done = true
      }
    }
    out.toSeq
  }

  // the Sennrich toy corpus: "est</w>" then "lo" emerge as early merges
  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("merge sequence == scalar reference BPE on the Sennrich corpus") {
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val m = BpeTrainer.train(df, "text", numMerges = 10, minCount = 1L)
    val wordFreq = corpus.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val expected = refBpe(wordFreq, 10)
    assert(m.merges.map(g => (g.left, g.right, g.pairCount)) == expected)
    assert(m.merges.map(_.rank) == m.merges.indices)
  }

  test("repeated symbols merge left-to-right non-overlapping") {
    // "aaaa" x3 = [a,a,a,a</w>]: (a,a) counts once per adjacent position
    // (2 per word) and must merge left-to-right non-overlapping — the
    // degenerate case where greedy re-matching or position-set counting
    // would diverge. The scalar reference IS the semantics.
    val df = Seq((0L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m = BpeTrainer.train(df, "text", numMerges = 4, minCount = 1L)
    val expected = refBpe(Map("aaaa" -> 3L), 4)
    assert(m.merges.map(g => (g.left, g.right, g.pairCount)) == expected)
  }

  test("training is deterministic and count-exhaustion stops early") {
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val m1 = BpeTrainer.train(df, "text", numMerges = 50, minCount = 1L)
    val m2 = BpeTrainer.train(df, "text", numMerges = 50, minCount = 1L)
    assert(m1.merges == m2.merges)
    // 50 rounds over a 4-word corpus must exhaust (every surviving pair
    // unique) well before the cap
    assert(m1.merges.size < 50)
    m1.merges.foreach(g => assert(g.pairCount > 1))
  }

  test("256-merge run crosses truncation cuts with the sequence unchanged") {
    // >64 productive merges forces the merge-chain lineage truncation
    // (ChainTruncateEvery = 64) to fire several times mid-run; the merge
    // sequence must be byte-identical to the scalar reference across every
    // cut, and the run must COMPLETE with bounded plan depth (the
    // untruncated form stacks one UDF per merge — at 256 the optimizer
    // tree alone would dominate). Corpus: 120 distinct 6-letter words,
    // each twice, ~600 count-2 pairs available.
    assert(BpeTrainer.ChainTruncateEvery < 256)
    val words256 = (0 until 120).map { i =>
      (0 until 6).map(p => ('a' + (i / math.pow(5, p).toInt) % 5 + p % 3).toChar)
        .mkString + ('a' + i % 26).toChar
    }.distinct
    val corpus256 = words256 ++ words256
    val df = corpus256.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    // maxDriverWords = 0 forces the DISTRIBUTED loop — the truncation
    // machinery under test only exists there
    val m = BpeTrainer.train(df, "text", numMerges = 256, minCount = 1L,
      maxDriverWords = 0L)
    val wordFreq = corpus256.groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expected = refBpe(wordFreq, 256)
    assert(m.merges.size > BpeTrainer.ChainTruncateEvery,
      s"corpus exhausted at ${m.merges.size} merges before the first cut")
    assert(m.merges.map(g => (g.left, g.right, g.pairCount)) == expected)
    // the returned word table reads the final persisted cut + <=64 UDFs
    assert(m.wordCounts.count() == words256.size)
  }

  test("batched rounds: merge table == sequential reference in far fewer jobs") {
    // a realistic skewed count distribution (distinct pair counts) is
    // where batching earns its keep: the trainer must return the
    // byte-identical merge table the per-merge sequential loop produces
    // (refBpe IS that loop) while running a fraction of the rounds
    val words = (0 until 80).map { i =>
      val s = new StringBuilder
      var v = i + 7
      while (v > 0) { s += ('a' + v % 7 + (i % 3)).toChar; v /= 3 }
      s.result() + ('f' + i % 11).toChar
    }
    val corpus = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(1 + (i * 13) % 37)(w)
    }
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val expected = {
      val wordFreq = corpus.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      refBpe(wordFreq, 64)
    }
    // distributed batched loop: same table, fewer jobs than merges
    val m = BpeTrainer.train(df, "text", numMerges = 64, minCount = 1L,
      maxDriverWords = 0L)
    assert(m.merges.map(g => (g.left, g.right, g.pairCount)) == expected)
    assert(m.merges.size > 20, s"corpus too small: ${m.merges.size} merges")
    assert(m.rounds < m.merges.size,
      s"batching never fired: ${m.rounds} rounds for ${m.merges.size} merges")
    // driver-local incremental loop (the default under DriverVocabLimit):
    // byte-identical merge table, ONE Spark job total
    val local = BpeTrainer.train(df, "text", numMerges = 64, minCount = 1L)
    assert(local.merges == m.merges)
    assert(local.rounds == 1)
  }

  test("selectBatch is a strict prefix and rejects interference chains") {
    // (a,b) merged to "ab" can create ("z","ab") with count up to
    // min(cnt(z,a), cnt(a,b)) = 8 — so the count-8 candidate ("c","d")
    // can tie with it and must only survive if it wins the pair-asc
    // tie-break; ("b","e") shares a symbol and must stop the scan even
    // though later candidates would be disjoint
    val cands1 = Array(("a", "b", 10L), ("c", "d", 8L), ("z", "a", 8L))
    // ("c","d") < ("z","ab") lexicographically: tie is safe, but
    // ("z","a") shares 'a' -> stop there
    assert(BpeTrainer.selectBatch(cands1, haveAll = true, maxSize = 10)
      .map(t => (t._1, t._2)) == Seq(("a", "b"), ("c", "d")))
    // ("x","y") ties at 8 with possible ("w","ab") — created up to 5
    // plus the PRE-EXISTING ("w","ab") count 3 (symbol collision) — and
    // loses the pair-asc tie-break ("w" < "x"), so the batch stops
    val cands2 = Array(("a", "b", 10L), ("x", "y", 8L), ("w", "a", 5L),
      ("w", "ab", 3L))
    assert(BpeTrainer.selectBatch(cands2, haveAll = true, maxSize = 10)
      .map(t => (t._1, t._2)) == Seq(("a", "b")))
    // truncated table (floor = last count 10): nothing at or below
    // 2*floor may join — pairs below the cut have unknown identities
    val cands3 = Array(("a", "b", 100L), ("c", "d", 25L), ("e", "f", 10L))
    assert(BpeTrainer.selectBatch(cands3, haveAll = false, maxSize = 10)
      .map(t => (t._1, t._2)) == Seq(("a", "b"), ("c", "d")))
  }

  test("vocab: the dominant word collapses toward a single token") {
    val df = (Seq.fill(20)("alpha") ++ Seq.fill(2)("beta"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = BpeTrainer.train(df, "text", numMerges = 8, minCount = 1L)
    val v = BpeTrainer.vocab(m).as[(String, Long)].collect().toMap
    assert(v.contains("alpha" + BpeTrainer.EndMark), s"vocab was: $v")
    assert(v("alpha" + BpeTrainer.EndMark) == 20L)
  }

  test("encode reproduces the training segmentation on every training word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = BpeTrainer.train(docs, "text", numMerges = 12, minCount = 2L)
    assert(m.merges.nonEmpty)
    // every word the trainer saw, re-tokenized through the rank-order
    // encode loop, must land on exactly the trainer's final symbols
    val fromTrainer = m.wordCounts.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    val encoded = BpeTrainer
      .encode(fromTrainer.keys.toSeq.toDF("text"), "text", m.merges)
      .select("text", "tokens").as[(String, Seq[String])].collect()
    assert(encoded.nonEmpty)
    encoded.foreach { case (w, toks) =>
      assert(toks == fromTrainer(w), s"word '$w': $toks != ${fromTrainer(w)}")
    }
  }

  test("encode handles nulls, unknown characters, and empty text") {
    val m = BpeTrainer.train(
      Seq((0L, "hello hello world")).toDF("doc_id", "text"), "text", 4)
    val out = BpeTrainer.encode(
      Seq((0L, null.asInstanceOf[String]), (1L, "..!!.."), (2L, ""),
        (3L, "hello zzz")).toDF("doc_id", "text"), "text", m.merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(out(0L).isEmpty && out(1L).isEmpty && out(2L).isEmpty)
    // unknown word falls back to (partially merged) characters, never drops
    assert(out(3L).mkString.replace(BpeTrainer.EndMark, "") == "hellozzz")
  }

  test("registry query returns the ranked merge table on the fixture") {
    val df = SparkEntry.queries("bpe_train")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == rows.indices)
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 1L)
    }
  }
}
