package graft.functions

import graft.operators.UnigramLm
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[UnigramLm.viterbi]] as a native expression — the last Scala UDF in a
  * measured family, ported to the house kernel pattern ([[WinnowSelect]],
  * FfdPack): same integer-cost DP, same (cost, path) lexicographic
  * tie-break, evaluated directly on the unsafe row without the UDF's
  * encoder round-trip (Row ⇄ case class serialization per call).
  *
  * Field order matches [[UnigramLm.Seg]] so the struct reads the callers
  * already use (`v.cost`, `v.pieces`, `v.nPieces`) are unchanged.
  *
  * Applied only to the DISTINCT word table (vocab-bounded — the
  * UnigramQueries scale contract), so CodegenFallback costs nothing
  * measurable; the DP itself dominates.
  */
case class UnigramViterbi(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string word, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cost", LongType, nullable = false),
    StructField("pieces", StringType, nullable = false),
    StructField("nPieces", LongType, nullable = false)))

  override def prettyName: String = "unigram_viterbi"

  override def nullSafeEval(input: Any): Any = {
    val seg = UnigramLm.viterbi(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](
      seg.cost, UTF8String.fromString(seg.pieces), seg.nPieces))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramFunctions {
  /** See [[UnigramViterbi]]. */
  def unigramViterbi(word: Column): Column =
    SparkBridge.column(UnigramViterbi(SparkBridge.expression(word)))
}
