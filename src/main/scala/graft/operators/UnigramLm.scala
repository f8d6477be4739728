package graft.operators

/** Unigram-LM tokenizer (the SentencePiece family — Kudo 2018), the
  * second of the two production subword-tokenizer families next to
  * [[BpeTrainer]] (BPE). Where BPE *builds* tokens bottom-up by merge
  * rank, the unigram model *selects* a segmentation top-down: every
  * piece carries a cost (a scaled negative log-probability) and a word's
  * tokenization is the minimum-total-cost segmentation, found by Viterbi
  * dynamic programming over the character positions.
  *
  * Reference behavior anchor: the reference pipeline counts tokens and
  * caps embedding inputs by token budget (src/llm_integration.py:83-101
  * token estimation); this operator family supplies the real
  * tokenizer-side machinery a 100 TB curation pipeline adds on top —
  * encode under a fixed vocabulary, corpus fertility audit, and the
  * SentencePiece prune step of training.
  *
  * Exactness policy (the `bpe_encode_fixed` pattern): all costs are
  * INTEGER (fixed-point neg-logprobs), so the DP total is exact integer
  * arithmetic and ties are broken by the lexicographically smallest
  * piece string — a total order both engines can state, making the whole
  * segmentation DuckDB-oracle-checkable. With space (0x20) as the piece
  * separator and lowercase-ASCII words, two distinct segmentations of
  * the same word first differ at an index where one has a separator and
  * the other a letter, so lexicographic comparison is strict and —
  * because a candidate at position i extends by an identical suffix —
  * prefix-optimal (the standard Viterbi argument extends to the
  * (cost, path) lexicographic order).
  *
  * Scale: Viterbi is row-local O(len · maxPieceLen) over the DISTINCT
  * word table — the same vocab-bounded unit [[BpeTrainer]] aggregates to.
  * At 100 TB the corpus-sized stages are one split+explode and one
  * (word → count) hash aggregation with map-side combine; the DP itself
  * never touches corpus rows.
  */
object UnigramLm {

  /** Cost charged to a single character absent from the vocabulary
    * (UNK coverage fallback — SentencePiece's character coverage floor).
    * The shipped [[Vocab]] lists every ASCII letter, so on the driver's
    * ASCII corpus this is never hit; it keeps the operator total on
    * arbitrary input. */
  val UnkCharCost = 700L

  /** The fixed piece table: every lowercase ASCII letter (coverage) plus
    * multi-character pieces with sub-additive costs, so the DP genuinely
    * prefers them. Integer costs ~ -log p(piece) scaled; exact values are
    * part of the operator contract (the oracle restates them). */
  val Vocab: Seq[(String, Long)] = Seq(
    // single-character coverage tier
    "a" -> 450L, "e" -> 450L, "t" -> 460L, "o" -> 470L, "r" -> 480L,
    "s" -> 480L, "n" -> 490L, "i" -> 490L, "l" -> 500L, "u" -> 510L,
    "c" -> 520L, "d" -> 520L, "h" -> 530L, "m" -> 540L, "p" -> 550L,
    "g" -> 560L, "w" -> 570L, "b" -> 580L, "y" -> 590L, "f" -> 600L,
    "k" -> 610L, "v" -> 620L, "j" -> 650L, "q" -> 660L, "x" -> 670L,
    "z" -> 680L,
    // multi-character pieces
    "th" -> 640L, "st" -> 660L, "or" -> 670L, "er" -> 680L, "ar" -> 690L,
    "in" -> 690L, "re" -> 690L, "an" -> 700L, "on" -> 700L, "at" -> 700L,
    "ta" -> 700L, "to" -> 700L, "qu" -> 700L, "en" -> 710L, "al" -> 710L,
    "ab" -> 720L, "ue" -> 720L, "sc" -> 720L, "sp" -> 720L, "me" -> 720L,
    "ch" -> 730L, "ow" -> 730L, "rt" -> 730L, "us" -> 730L, "ge" -> 730L,
    "am" -> 740L, "ry" -> 740L, "lu" -> 740L, "sm" -> 750L, "lt" -> 760L,
    "gg" -> 760L,
    "the" -> 900L, "art" -> 1100L, "der" -> 1100L, "ine" -> 1120L,
    "val" -> 1130L, "ble" -> 1150L)

  val VocabMap: Map[String, Long] = Vocab.toMap
  val MaxPieceLen: Int = Vocab.map(_._1.length).max

  /** Minimum freq-weighted use count for a multi-character piece to
    * survive the prune step (`unigram_train_prune`); single characters
    * are always kept (coverage). */
  val MinPieceUses = 5L

  /** One Viterbi segmentation result. `pieces` is the space-joined piece
    * sequence; `cost` the exact integer total. */
  final case class Seg(cost: Long, pieces: String, nPieces: Long)

  /** Minimum-cost segmentation of `word` under [[Vocab]], ties broken by
    * the lexicographically smallest piece string (see class doc for why
    * that order is DP-composable). Total for any input: characters not
    * in the vocab segment as single UNK-cost pieces. */
  def viterbi(word: String): Seg = viterbi(word, VocabMap, MaxPieceLen)

  def viterbi(word: String, vocab: Map[String, Long], maxPieceLen: Int): Seg = {
    val n = word.length
    if (n == 0) return Seg(0L, "", 0L)
    val cost = Array.fill(n + 1)(Long.MaxValue)
    val path = new Array[String](n + 1)
    cost(0) = 0L
    path(0) = ""
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (cost(j) != Long.MaxValue) {
          val piece = word.substring(j, i)
          val c = vocab.get(piece) match {
            case Some(v)                      => v
            case None if piece.length() == 1  => UnkCharCost
            case None                         => -1L
          }
          if (c >= 0L) {
            val nc = cost(j) + c
            val np = if (j == 0) piece else path(j) + " " + piece
            if (nc < cost(i) || (nc == cost(i) && np.compareTo(path(i)) < 0)) {
              cost(i) = nc
              path(i) = np
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val p = path(n)
    Seg(cost(n), p, (p.count(_ == ' ') + 1).toLong)
  }

  /** Brute-force reference: enumerate EVERY segmentation and take the
    * (cost, pieces) lexicographic minimum — the spec's oracle for
    * [[viterbi]] on short words. Exponential; test-only. */
  private[graft] def bruteBest(word: String): Seg = {
    def all(from: Int): Seq[(Long, List[String])] =
      if (from == word.length) Seq((0L, Nil))
      else (1 to math.min(MaxPieceLen, word.length - from)).flatMap { k =>
        val piece = word.substring(from, from + k)
        val c = VocabMap.get(piece) match {
          case Some(v)                     => v
          case None if piece.length() == 1 => UnkCharCost
          case None                        => -1L
        }
        if (c < 0L) Nil
        else all(from + k).map { case (sc, ps) => (sc + c, piece :: ps) }
      }
    val best = all(0).map { case (c, ps) => (c, ps.mkString(" ")) }
      .minBy(identity)(Ordering.Tuple2(Ordering.Long, Ordering.String))
    Seg(best._1, best._2, (best._2.count(_ == ' ') + 1).toLong)
  }
}
