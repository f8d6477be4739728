package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar — the canonical-
  * composition step of a text-cleaning pipeline (é as one codepoint vs
  * e + combining acute must fingerprint/dedup/shingle identically, or a
  * crawler that emits decomposed forms defeats every exact-match operator
  * downstream). Spark has no normalization builtin; a Scala UDF would
  * break whole-stage codegen and pay serialization on the hottest column
  * in the corpus, so this is a native `Expression` like the other
  * per-row kernels here.
  *
  * The `isNormalized` fast path matters at corpus scale: real text is
  * overwhelmingly already-NFC (all-ASCII trivially so), and the check is
  * a single scan with no allocation — only the rare decomposed row pays
  * the normalize + re-encode cost.
  *
  * Oracle twin: DuckDB's `nfc_normalize` — both implement UAX #15 NFC,
  * so outputs hash-match bit-for-bit.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column wrapper. */
  def nfcNormalize(c: Column): Column =
    SparkBridge.column(NfcNormalize(SparkBridge.expression(c)))
}
