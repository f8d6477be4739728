package graft.queries

import graft.{Q, Tables => T}
import graft.operators.UnigramLm
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-family) tokenizer queries — the selection
  * counterpart of the BPE rows in TrainingDataQueries (`bpe_*`): encode
  * under a fixed piece table, the corpus fertility audit, and the
  * SentencePiece prune step. See [[graft.operators.UnigramLm]] for the
  * Viterbi exactness argument (integer costs + lexicographic tie-break)
  * that makes every row here hash-checkable against DuckDB.
  *
  * Scale shape shared by all three: the only corpus-sized stages are one
  * split+explode and one (word → count) hash aggregation with map-side
  * combine; Viterbi runs on the DISTINCT word table (vocab-bounded, the
  * same unit BpeTrainer aggregates to), and every join back is
  * broadcast-sized by construction.
  */
object UnigramQueries {

  /** Engine-side word split — identical to the BPE convention:
    * lowercase, split on non-letters, drop empties ([^a-z]+ equals the
    * \p{L} split on this ASCII corpus; see BpeWordsSql). */
  private[graft] def wordsCol(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= "")

  /** The native Viterbi kernel ([[graft.functions.UnigramViterbi]]) —
    * replaced the r12 Scala UDF (VERDICT r12 #5): same DP, no encoder
    * round-trip per call. */
  private def vit(word: Column): Column =
    graft.functions.UnigramFunctions.unigramViterbi(word)

  /** (word, n_occ) corpus frequencies — one explode + one hash agg. */
  private def wordFreq(s: SparkSession, dir: String): DataFrame =
    T.documentsSpread(s, dir)
      .select(explode(wordsCol(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_occ"))

  // ---------------------------------------------------------------- SQL

  private val WordsSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '')"

  private val VocabValuesSql: String =
    UnigramLm.Vocab.map { case (p, c) => s"('$p', CAST($c AS BIGINT))" }
      .mkString(", ")

  /** The oracle restates Viterbi for words up to this length. The former
    * recursive CTE enumerated every segmentation (~1.8^len paths — a long
    * word would blow up the oracle even though the engine DP stays
    * O(len·maxPieceLen), ADVICE r12); the unrolled per-(word,pos) DP
    * below is polynomial and bounded by construction. The corpus's max
    * word length is 8 at every SF (31-word synthetic vocabulary); 24
    * gives 3× headroom. A longer word would surface loudly as a
    * row-count mismatch (engine row, no oracle row), never as a silent
    * wrong segmentation. */
  private val MaxOracleWordLen = 24

  /** vocab + d0..dN + best CTEs; callers must have defined a `words` CTE
    * with a `word` column. This is the engine DP stated in SQL: CTE `d$i`
    * holds, per word of length ≥ i, THE single best (cost, path) state at
    * character position i — each step extends the best states at
    * positions i-1..i-maxPieceLen by one matching vocab piece and keeps
    * the (cost, path)-minimum per word (prefix-optimality of the
    * lexicographic order is the [[UnigramLm]] class-doc argument; keeping
    * one state per position is exactly what makes this DP, not
    * enumeration). Every step is MATERIALIZED: DuckDB inlines plain CTEs
    * per reference, and with each d$i referenced by the next maxPieceLen
    * steps the inlined tree (and its parquet re-opens) would grow
    * ~3^N — materialization keeps the oracle one pass per step, the DP
    * cost model. `best` exposes the final state per word with a constant
    * `rn = 1` so consumer SQL reads it like the old ranked form. */
  private val SegCtes: String = {
    val maxP = UnigramLm.MaxPieceLen
    val steps = (1 to MaxOracleWordLen).map { i =>
      val branches = (math.max(0, i - maxP) until i).map { j =>
        val len = i - j
        s"""    SELECT d.word, d.cost + v.cost AS cost,
           |      CASE WHEN d.path = '' THEN v.piece
           |           ELSE d.path || ' ' || v.piece END AS path
           |    FROM d$j d JOIN vocab v
           |      ON length(v.piece) = $len
           |     AND v.piece = substr(d.word, ${j + 1}, $len)
           |    WHERE length(d.word) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""d$i AS MATERIALIZED (
         |  SELECT word, cost, path FROM (
         |    SELECT word, cost, path,
         |      row_number() OVER (PARTITION BY word ORDER BY cost, path) AS rn
         |    FROM (
         |$branches))
         |  WHERE rn = 1)""".stripMargin
    }
    val finals = (1 to MaxOracleWordLen)
      .map(i => s"  SELECT word, cost, path FROM d$i WHERE length(word) = $i")
      .mkString("\n  UNION ALL\n")
    s"""vocab(piece, cost) AS (VALUES $VocabValuesSql),
       |d0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS cost, '' AS path
       |       FROM (SELECT DISTINCT word FROM words)),
       |${steps.mkString(",\n")},
       |best AS (
       |  SELECT word, cost, path, 1 AS rn FROM (
       |$finals))""".stripMargin
  }

  private val WordsCteSql =
    s"""words AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n_occ
       |  FROM (SELECT unnest($WordsSql) AS w FROM documents)
       |  GROUP BY w)""".stripMargin

  // ------------------------------------------------------------ queries

  val all: Seq[(String, Q)] = Seq(

    "unigram_encode_fixed" -> Q(
      "Unigram-LM (SentencePiece) Viterbi encode under the fixed integer-cost piece table — exact (cost, path) tie-break, oracle-checked per distinct word",
      (s, dir) => {
        // kernel applied AFTER the (word -> count) agg: one DP call per
        // DISTINCT word, no join back
        wordFreq(s, dir)
          .select(col("word"), col("n_occ"), vit(col("word")).as("v"))
          .select(col("word"), col("n_occ"),
            col("v.cost").as("vit_cost"),
            col("v.nPieces").as("n_pieces"),
            col("v.pieces").as("pieces"))
          .orderBy(col("n_occ").desc, col("word"))
      },
      s"""WITH
         |$WordsCteSql,
         |$SegCtes
         |SELECT w.word, w.n_occ, b.cost AS vit_cost,
         |  CAST(len(string_split(b.path, ' ')) AS BIGINT) AS n_pieces,
         |  b.path AS pieces
         |FROM words w JOIN best b ON b.word = w.word AND b.rn = 1
         |ORDER BY w.n_occ DESC, w.word""".stripMargin),

    "unigram_fertility" -> Q(
      "Tokenizer fertility audit per source: freq-weighted pieces/word and Viterbi cost/char — the corpus-level acceptance gate for a candidate vocab",
      (s, dir) => {
        // DP per (source, word) group — still vocab-bounded (sources ×
        // distinct words), and skips the extra distinct + broadcast join
        T.documentsSpread(s, dir)
          .select(col("source"), explode(wordsCol(col("text"))).as("word"))
          .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
          .select(col("source"), col("word"), col("cnt"),
            vit(col("word")).as("v"))
          .select(col("source"), col("word"), col("cnt"),
            col("v.cost").as("vit_cost"), col("v.nPieces").as("n_pieces"))
          .groupBy("source")
          .agg(
            sum(col("cnt")).as("n_words"),
            sum(col("cnt") * col("n_pieces")).as("n_pieces"),
            (sum(col("cnt") * col("n_pieces")).cast("double") /
              sum(col("cnt")).cast("double")).as("pieces_per_word"),
            (sum(col("cnt") * col("vit_cost")).cast("double") /
              sum(col("cnt") * length(col("word")).cast("long"))
                .cast("double")).as("cost_per_char"))
          .orderBy(col("source"))
      },
      s"""WITH
         |sw AS (
         |  SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT source, unnest($WordsSql) AS w FROM documents)
         |  GROUP BY source, w),
         |words AS (SELECT DISTINCT word FROM sw),
         |$SegCtes,
         |v AS (
         |  SELECT word, cost,
         |    CAST(len(string_split(path, ' ')) AS BIGINT) AS np
         |  FROM best WHERE rn = 1)
         |SELECT sw.source,
         |  CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
         |  CAST(SUM(sw.cnt * v.np) AS BIGINT) AS n_pieces,
         |  CAST(SUM(sw.cnt * v.np) AS DOUBLE) / CAST(SUM(sw.cnt) AS DOUBLE)
         |    AS pieces_per_word,
         |  CAST(SUM(sw.cnt * v.cost) AS DOUBLE)
         |    / CAST(SUM(sw.cnt * length(sw.word)) AS DOUBLE) AS cost_per_char
         |FROM sw JOIN v ON v.word = sw.word
         |GROUP BY sw.source ORDER BY sw.source""".stripMargin),

    "unigram_train_prune" -> Q(
      "SentencePiece prune step: freq-weighted piece use counts along corpus Viterbi paths; single chars always kept (coverage), multi-char pieces kept at >= " +
        s"${UnigramLm.MinPieceUses} uses",
      (s, dir) => {
        val uses = wordFreq(s, dir)
          .select(vit(col("word")).as("v"), col("n_occ"))
          .select(explode(split(col("v.pieces"), " ")).as("piece"),
            col("n_occ"))
          .groupBy("piece").agg(sum(col("n_occ")).as("u"))
        val vocabDf = s.createDataFrame(UnigramLm.Vocab).toDF("vpiece", "vcost")
        vocabDf.join(uses, col("vpiece") === col("piece"), "full_outer")
          .select(
            coalesce(col("vpiece"), col("piece")).as("piece"),
            coalesce(col("vcost"), lit(UnigramLm.UnkCharCost)).as("cost"),
            coalesce(col("u"), lit(0L)).as("n_uses"))
          .withColumn("action",
            when(length(col("piece")) === 1, "keep_char")
              .when(col("n_uses") >= UnigramLm.MinPieceUses, "keep")
              .otherwise("prune"))
          .orderBy(col("n_uses").desc, col("piece"))
      },
      s"""WITH
         |$WordsCteSql,
         |$SegCtes,
         |uses AS (
         |  SELECT piece, CAST(SUM(n_occ) AS BIGINT) AS n_uses
         |  FROM (SELECT w.n_occ, unnest(string_split(b.path, ' ')) AS piece
         |        FROM best b JOIN words w ON w.word = b.word WHERE b.rn = 1)
         |  GROUP BY piece)
         |SELECT COALESCE(v.piece, u.piece) AS piece,
         |  COALESCE(v.cost, CAST(${UnigramLm.UnkCharCost} AS BIGINT)) AS cost,
         |  COALESCE(u.n_uses, CAST(0 AS BIGINT)) AS n_uses,
         |  CASE WHEN length(COALESCE(v.piece, u.piece)) = 1 THEN 'keep_char'
         |       WHEN COALESCE(u.n_uses, CAST(0 AS BIGINT))
         |            >= ${UnigramLm.MinPieceUses} THEN 'keep'
         |       ELSE 'prune' END AS action
         |FROM vocab v FULL OUTER JOIN uses u ON u.piece = v.piece
         |ORDER BY n_uses DESC, piece""".stripMargin))
}
