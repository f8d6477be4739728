package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** Properties of the unigram-LM (SentencePiece-family) Viterbi encoder
  * beyond what the DuckDB oracle pins: optimality against brute-force
  * segmentation enumeration, the (cost, path) lexicographic tie-break,
  * UNK coverage, and the cross-query counting invariants linking
  * encode / fertility / prune. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("viterbi matches brute-force enumeration on every corpus word") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(UnigramLm.viterbi(w) == UnigramLm.bruteBest(w), s"word $w")
    }
  }

  test("viterbi matches brute force on seeded random words over the vocab alphabet") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(9)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(UnigramLm.viterbi(w) == UnigramLm.bruteBest(w), s"word $w")
    }
  }

  test("the native UnigramViterbi expression equals the kernel per word and passes null through") {
    val words = Seq("the", "theatre", "qux", "a").toDF("w")
    val got = words
      .select(col("w"),
        graft.functions.UnigramFunctions.unigramViterbi(col("w")).as("v"))
      .select(col("w"), col("v.cost"), col("v.pieces"), col("v.nPieces"))
      .collect()
    got.foreach { r =>
      val seg = UnigramLm.viterbi(r.getString(0))
      assert((r.getLong(1), r.getString(2), r.getLong(3)) ==
        ((seg.cost, seg.pieces, seg.nPieces)), s"word ${r.getString(0)}")
    }
    // UnaryExpression null semantics: a null word yields a null struct
    val n = Seq[Option[String]](None).toDF("w")
      .select(graft.functions.UnigramFunctions.unigramViterbi(col("w")).as("v"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("segmentation reassembles the word and cost sums the piece costs") {
    val words = Seq("table", "customer", "the", "query", "spark", "window")
    words.foreach { w =>
      val seg = UnigramLm.viterbi(w)
      val ps = seg.pieces.split(' ')
      assert(ps.mkString == w)
      assert(ps.length.toLong == seg.nPieces)
      assert(ps.map(UnigramLm.VocabMap).sum == seg.cost)
    }
  }

  test("equal-cost ties break to the lexicographically smallest piece string") {
    // a|b|c, ab|c and a|bc all cost 3 — 'a b c' is the lexicographic min
    val vocab = Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "ab" -> 2L, "bc" -> 2L)
    val seg = UnigramLm.viterbi("abc", vocab, 2)
    assert(seg.cost == 3L && seg.pieces == "a b c")
  }

  test("characters outside the vocab fall back to single UNK-cost pieces") {
    val seg = UnigramLm.viterbi("axa", Map("a" -> 1L), 1)
    assert(seg == UnigramLm.Seg(2L + UnigramLm.UnkCharCost, "a x a", 3L))
    // multi-char pieces never bridge an unknown char
    val seg2 = UnigramLm.viterbi("ab", Map("a" -> 1L), 2)
    assert(seg2.pieces == "a b")
  }

  test("unigram_encode_fixed rows reassemble and recount") {
    val rows = q("unigram_encode_fixed")
      .select("word", "vit_cost", "n_pieces", "pieces")
      .as[(String, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, c, n, p) =>
      assert(p.split(' ').mkString == w)
      assert(p.split(' ').length.toLong == n)
      assert(UnigramLm.viterbi(w).cost == c)
    }
  }

  test("prune keeps every single char, thresholds multis, and uses sum to fertility's piece total") {
    val prune = q("unigram_train_prune")
      .select("piece", "n_uses", "action").as[(String, Long, String)].collect()
    prune.foreach { case (p, u, a) =>
      if (p.length == 1) assert(a == "keep_char")
      else if (u >= UnigramLm.MinPieceUses) assert(a == "keep")
      else assert(a == "prune")
    }
    val totalUses = prune.map(_._2).sum
    val totalPieces = q("unigram_fertility")
      .agg(sum("n_pieces")).as[Long].head()
    assert(totalUses == totalPieces,
      s"piece-use total $totalUses != fertility piece total $totalPieces")
  }
}
