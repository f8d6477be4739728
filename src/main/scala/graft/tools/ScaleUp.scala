package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× inflation of a driver fixture (VERDICT r7 task #1).
  *
  * Every 100 TB claim in SCALE.md rests on measured runs at sf0.1 (17 MB);
  * this tool synthesizes the next empirical scale point by inflating sf0.1
  * `factor`× such that the STATISTICS the heavy operators are sensitive to
  * are preserved per copy and independent across copies:
  *
  *  - `documents`: copy 0 is the original corpus byte-for-byte. Copy k>0
  *    re-ids (`doc_id + k·stride`, stride = next power of 10 above the source's max id) and applies a word-level salt (every
  *    whitespace token gets the copy number appended). Within a copy the
  *    shingle/near-dup structure is IDENTICAL to the original — the salt
  *    is a bijection on the token alphabet, so two docs share a salted
  *    shingle iff they shared the unsalted one — while across copies no
  *    shingle ever collides. Net: dedup rate per copy equals sf0.1's,
  *    total near-dup pairs scale exactly linearly, and an inflation that
  *    just duplicated text (making 90% of the corpus exact dups) is
  *    avoided.
  *  - `embeddings`: copy k>0 re-ids (`vec_id + k·stride`) and applies ONE
  *    orthogonal transform per copy — a k-step dimension rotation times a
  *    per-(dim,copy) ±1 sign pattern. Orthogonality means every
  *    within-copy inner product (hence cosine) is bit-preserved, so the
  *    semantic-dedup rate and k-NN neighborhoods per copy equal the
  *    original's; across copies the transforms differ, decorrelating the
  *    copies. Norms are untouched.
  *  - `lineitem`: copy k offsets `l_orderkey` and `l_partkey` by their own
  *    collision-free strides: the part co-purchase graph becomes `factor` disjoint
  *    isomorphic components — PageRank/CC rounds stay constant while
  *    |V|,|E| scale linearly, the exact regime a 100 TB corpus graph is in.
  *  - `events`: copy k offsets `event_id` and `user_id` by their own strides; timestamps untouched (windows see factor× density).
  *
  * All other tables are passed through unchanged (hard-linked/copied), so
  * any registry query runs against the output directory.
  *
  * ALWAYS inflate directly from the ORIGINAL fixture — never chain
  * ScaleUp over its own output. Chaining breaks both invariants at once
  * (found round 9, measured as a bogus 3.25×-linear third-decade
  * reading): (a) id collisions — two chained 10× passes give
  * `id + (a+b)·stride`, and a+b collides (a 500k-row chained "100×" held
  * only 95k distinct doc_ids), exploding every verify join by id
  * multiplicity; (b) salt collisions — copy (a=1, b=0) and (a=0, b=1)
  * both produce the token salt "1", so different chain paths share
  * vocabulary AND ids: the copies are no longer independent. The strides
  * are now derived from the source's actual max id (next power of 10),
  * and `main` fails loudly if an inflated table's ids are not unique —
  * but the salt is inherently single-application, so direct generation
  * is the contract, not just a recommendation.
  *
  * Usage: ScaleUp [srcDir] [outDir] [factor]; defaults
  * (/root/testdata/sf0.1, /root/repo/scale10, 10).
  */
object ScaleUp {
  /** Next power of 10 strictly greater than the column's max — collision-
    * free re-id stride for any source, chained or not. */
  private def strideFor(df: DataFrame, idCol: String): Long =
    stridesFor(df, idCol).head

  /** All requested strides from ONE max() scan (lineitem/events re-id two
    * columns; one job instead of one per column), failing loudly on an
    * empty source (max = NULL) instead of NPE-ing. */
  private def stridesFor(df: DataFrame, idCols: String*): Seq[Long] = {
    val row = df.agg(max(col(idCols.head)), idCols.tail.map(c => max(col(c))): _*)
      .collect()(0)
    idCols.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(i),
        s"strideFor($c): source table is empty (max is NULL) — nothing to inflate")
      val mx = row.getLong(i)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }
  }

  def inflateDocuments(df: DataFrame, factor: Int,
      salt: Boolean = true): DataFrame = {
    val copies = df.sparkSession.range(0, factor.toLong)
      .select(col("id").cast("int").as("copy"))
    // the source fixture is tiny (one parquet split), so WITHOUT a spread
    // the whole factor-x expansion + per-token salting runs in ONE task
    // (measured: the 20000x r14 generation sat single-threaded for 25+
    // minutes before this line existed); spread the small side across the
    // session's parallelism so the expansion is data-parallel from row one
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .crossJoin(broadcast(copies))
      .select(
        (col("doc_id") + col("copy").cast("long") * strideFor(df, "doc_id")).as("doc_id"),
        when(col("copy") === 0 || lit(!salt), col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              w => concat(w, col("copy").cast("string"))),
            " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def inflateEmbeddings(df: DataFrame, factor: Int): DataFrame = {
    val copies = df.sparkSession.range(0, factor.toLong)
      .select(col("id").cast("int").as("copy"))
    // Orthogonal per-copy transform: out[i] = in[(i+copy) mod d] * s(i,copy)
    // with s a deterministic ±1 pattern (Knuth multiplicative hash parity).
    // Permutation × diagonal(±1) preserves all within-copy inner products:
    // <P·s⊙u, P·s⊙v> = Σ s²·u·v = <u,v>.
    val d = size(col("embedding"))
    val transformed = transform(
      sequence(lit(0), d - 1),
      i => element_at(col("embedding"), pmod(i + col("copy"), d) + 1) *
        when(pmod((i + lit(1)).cast("long") * lit(2654435761L) +
          col("copy").cast("long"), lit(2)) === 0, lit(1.0f)).otherwise(lit(-1.0f)))
    df.crossJoin(broadcast(copies))
      .select(
        (col("vec_id") + col("copy").cast("long") * strideFor(df, "vec_id")).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(transformed.cast("array<float>")).as("embedding"),
        col("label"))
  }

  def inflateLineitem(df: DataFrame, factor: Int): DataFrame = {
    val copies = df.sparkSession.range(0, factor.toLong)
      .select(col("id").cast("int").as("copy"))
    val k = col("copy").cast("long")
    val Seq(orderStride, partStride) = stridesFor(df, "l_orderkey", "l_partkey")
    df.crossJoin(broadcast(copies))
      .withColumn("l_orderkey", col("l_orderkey") + k * orderStride)
      .withColumn("l_partkey", col("l_partkey") + k * partStride)
      .drop("copy")
  }

  def inflateEvents(df: DataFrame, factor: Int): DataFrame = {
    val copies = df.sparkSession.range(0, factor.toLong)
      .select(col("id").cast("int").as("copy"))
    val k = col("copy").cast("long")
    val Seq(eventStride, userStride) = stridesFor(df, "event_id", "user_id")
    df.crossJoin(broadcast(copies))
      .withColumn("event_id", col("event_id") + k * eventStride)
      .withColumn("user_id", col("user_id") + k * userStride)
      .drop("copy")
  }

  def main(args: Array[String]): Unit = {
    val src    = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out    = args.lift(1).getOrElse("/root/repo/scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // which of the four inflatable tables to actually inflate (the rest
    // pass through at 1x) — a 100x documents run shouldn't pay for 600M
    // lineitem rows it won't measure
    val inflate = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Set("documents", "embeddings", "lineitem", "events"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      // 32 output files: the inflated corpus must arrive as many splits
      // (documentsSpread's rationale) so scan parallelism is native, not
      // manufactured by the query.
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    // loud chaining/stride-bug tripwire: an inflated id column must stay
    // unique (the round-9 chained fixture held 95k distinct ids in 500k
    // rows and produced a bogus 3.25x-linear decade before this check)
    def assertUnique(name: String, idCol: String): Unit = {
      val df = spark.read.parquet(s"$out/$name.parquet")
      val (n, nd) = {
        val r = df.agg(count(lit(1)), countDistinct(col(idCol))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      require(n == nd,
        s"$name.$idCol not unique after inflation: $nd distinct of $n rows " +
          "(chained ScaleUp output? inflate directly from the original fixture)")
    }
    def maybe(name: String, f: DataFrame => DataFrame): Unit = {
      val in = spark.read.parquet(s"$src/$name.parquet")
      write(if (inflate(name)) f(in) else in, name)
    }
    // "documents_nosalt" inflates documents but duplicates text verbatim
    // (re-ids only): vocab stays CONSTANT under inflation — the control
    // fixture that isolates the salt-driven vocab-growth term in
    // bpe_encode's scaling (a real corpus's vocabulary grows ~log n; the
    // salted fixture's grows ~n)
    if (inflate("documents_nosalt"))
      write(inflateDocuments(
        spark.read.parquet(s"$src/documents.parquet"), factor, salt = false),
        "documents")
    else
      maybe("documents", inflateDocuments(_, factor))
    assertUnique("documents", "doc_id")
    maybe("embeddings", inflateEmbeddings(_, factor))
    assertUnique("embeddings", "vec_id")
    maybe("lineitem", inflateLineitem(_, factor))
    // events.ts may be nanos parquet (Tables.events handles both); pass
    // the raw column through unchanged so the output round-trips.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    maybe("events", inflateEvents(_, factor))
    assertUnique("events", "event_id")
    // Pass-through for the rest so every registry query resolves.
    val small = Seq("region", "nation", "customer", "supplier", "part", "orders")
    small.foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    spark.stop()
  }
}
