package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge

/** 16-bit SimHash of a (pre-distinct) token array in ONE pass: for each
  * token, bit b weighs +1 when the b-th hex nibble of md5(token) is odd
  * ("13579bdf"), else −1; signature bit b is set iff the per-bit sum over
  * all tokens is > 0.
  *
  * Bit-for-bit the declarative pipeline it replaces (TextOpsQueries round-2
  * `simhashOf`):
  *
  * {{{ explode(tokens) → md5 → explode(sequence(0,15)) →
  *     simhashNibbleWeight → groupBy(doc,bit).sum → groupBy(doc).sum(1<<bit) }}}
  *
  * which materialized tokens×16 rows per document through two hash-agg
  * shuffles (the round-2 bench's #2 outlier). Here the whole signature is
  * computed inside WholeStageCodegen with a reused MessageDigest; the only
  * shuffle left in `dedup_simhash` is none at all. PropertySpec pins
  * equality against the declarative groupBy form on fixture + random data.
  *
  * Null/edge semantics (matching the declarative spec exactly):
  *  - a NULL *element* weighs −1 on every bit — `simhashNibbleWeight`'s
  *    `when(instr(md5(null)...) > 0, 1).otherwise(-1)` null-routes to the
  *    otherwise branch (unreachable from `split()` output, pinned anyway);
  *  - an EMPTY array yields 0L (all sums are 0, no bit set). The groupBy
  *    form emits *no row* for a token-less doc; callers that need that
  *    behavior filter afterwards — `split("", " ")` returns `[""]` so no
  *    real document is token-less;
  *  - a NULL array yields NULL (standard null-intolerant semantics), where
  *    the groupBy form drops the document — callers filter `isNotNull`.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  def compute(toks: ArrayData): Long = {
    val sums = new Array[Int](16)
    val md = Digests.md5.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // spec parity: md5(null) null-routes simhashNibbleWeight to −1
        var b = 0
        while (b < 16) { sums(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var b = 0
        while (b < 16) {
          // hex char b of the md5 string = high nibble of byte b/2 when b
          // is even, low nibble when odd; "odd hex char" == odd nibble value
          val nib = if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
          if ((nib & 1) == 1) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (sums(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  def simhash16(toks: Column): Column =
    SparkBridge.column(SimHash16(SparkBridge.expression(toks)))
}
