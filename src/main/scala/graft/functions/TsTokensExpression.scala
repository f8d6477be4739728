package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementation of the F2 tsvector token pipeline
  * (lowercase → split on non-alphanumeric → stopword filter → stem),
  * ~4× faster than the equivalent higher-order-function composition: the
  * HOF form walks the token array once per nested lambda with boxed
  * evaluation, while this expression makes one pass in plain JVM code
  * invoked directly from generated code.
  *
  * Two stemmer modes:
  *  - `snowball = true` (the API/search default): the full English
  *    Snowball ("Porter2") stemmer [[Porter2]] — what Postgres
  *    `to_tsvector('english', …)` actually runs (reference:
  *    scripts/init_db.sql:66-71), so ts_rank ordering matches the
  *    reference on morphology-heavy corpora.
  *  - `snowball = false`: the SQL-expressible
  *    [[EmailFunctions.stemLite]] spec — kept as the DuckDB-oracle-
  *    checkable normalization (Porter2 is not expressible in the
  *    oracle's dialect; the fts extension is unavailable offline).
  *
  * The HOF composition stays as the cross-engine-reproducible spec for
  * the stem-lite mode (the property test pins this expression to it);
  * the snowball mode is pinned by Porter2Spec's golden vectors. Same
  * pattern as [[CosineSimilarity]]: spec first, codegen'd twin for scale.
  */
case class TsTokens(child: Expression, snowball: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ts_tokens"

  override def nullSafeEval(input: Any): Any =
    TsTokens.tokenize(input.asInstanceOf[UTF8String], snowball)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TsTokens.tokenize($c, $snowball)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TsTokens {
  private val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    EmailFunctions.Stopwords.foreach(s.add)
    s
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def tokenize(text: UTF8String, snowball: Boolean): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // UTF8String.toLowerCase == Spark's lower(): Unicode, locale-independent
    // (String.toLowerCase would depend on the JVM default locale).
    val s = text.toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = s.length
    while (i < n) {
      // skip separators (anything outside [a-z0-9])
      while (i < n && !isTokenChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (!stopwords.contains(tok)) {
          val stemmed =
            if (snowball) Porter2.stem(tok)
            else EmailFunctions.stemLiteScala(tok)
          out += UTF8String.fromString(stemmed)
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
}

object TsTokensFunctions {
  /** Codegen'd single-pass F2 pipeline as a Column (stem-lite spec mode). */
  def tsTokensFast(text: Column): Column =
    SparkBridge.column(TsTokens(SparkBridge.expression(text)))

  /** Codegen'd F2 pipeline with the full Snowball (Porter2) stemmer —
    * the Postgres-fidelity mode the API/search surface uses. */
  def tsTokensSnowball(text: Column): Column =
    SparkBridge.column(TsTokens(SparkBridge.expression(text), snowball = true))
}
