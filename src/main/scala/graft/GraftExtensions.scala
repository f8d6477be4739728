package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Coalesce, CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Session extension that exposes EVERY custom engine expression to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT cosine_sim(embedding, query_vec) FROM emails")
  * spark.sql("SELECT simhash16(split(text, ' ')) FROM documents")
  * spark.sql("SELECT minhash_signature(shingles, 4) FROM staged")
  * }}}
  *
  * Registration also works on a live session via
  * [[org.apache.spark.sql.graftbridge.SparkBridge.registerFunction]].
  * Static parameters (signature length m, shingle width k) must be
  * integer literals, mirroring how Spark's own parameterized functions
  * (e.g. `approx_count_distinct`) take their precision argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_])(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))

    register("cosine_sim", classOf[CosineSimilarity])(
      cs => CosineSimilarity(cs(0), cs(1)))
    // NULL-parity wrapper (same contract as minhash_signature below): the
    // raw expression is null-intolerant, but the engine's tsTokens spec
    // treats NULL text as "" → empty token array. Optional second arg:
    // ts_tokens(text, true) stems with the full Snowball/Porter2 instead
    // of the SQL-expressible stem-lite spec.
    register("ts_tokens", classOf[TsTokens])(cs => {
      val snowball = cs.lift(1) match {
        case None => false
        case Some(Literal(b: Boolean, org.apache.spark.sql.types.BooleanType)) => b
        case Some(other) => throw new IllegalArgumentException(
          s"ts_tokens snowball flag must be a boolean literal, got $other")
      }
      Coalesce(Seq(TsTokens(cs(0), snowball),
        Literal.create(Seq.empty[String],
          org.apache.spark.sql.types.ArrayType(StringType))))
    })
    register("simhash16", classOf[SimHash16])(cs => SimHash16(cs(0)))
    // same NULL-input parity wrapper as TextFunctions.minhashSignature:
    // the raw expression is null-intolerant, the spec yields m nulls
    register("minhash_signature", classOf[MinHashSignature])(cs => {
      val m = intLit(cs(1), "signature length m")
      Coalesce(Seq(MinHashSignature(cs(0), m),
        CreateArray(Seq.fill(m)(Literal.create(null, StringType)))))
    })
    register("hashed_shingles", classOf[HashedShingles])(
      cs => HashedShingles(cs(0), intLit(cs(1), "shingle width k")))
    register("sorted_intersect_size", classOf[SortedIntersectSize])(
      cs => SortedIntersectSize(cs(0), cs(1)))
    register("gram_stats", classOf[GramStats])(
      cs => GramStats(cs(0), intLit(cs(1), "gram width k")))
    // Opt-in ANN rewrite: inert unless spark.graft.ann.rewrite=true
    // (see graft.plans.AnnBucketRewrite).
    ext.injectOptimizerRule(_ => graft.plans.AnnBucketRewrite())
  }
}
