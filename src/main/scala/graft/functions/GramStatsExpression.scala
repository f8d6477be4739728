package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** Per-document k-gram repetition statistics in ONE row-local pass:
  * `struct(n_grams, top_c, dup_c)` where `n_grams` is the total k-gram
  * count, `top_c` the count of the most frequent k-gram, and `dup_c` the
  * total count of k-grams occurring more than once — the inputs to the
  * Gopher repetition filters (top-k-gram fraction, duplicate-k-gram
  * fraction).
  *
  * Gram construction follows [[TextFunctions.shingles]] exactly: docs
  * with ≤ k tokens contribute ONE whole-document gram; otherwise each
  * window of k tokens joined by a single space. Values are bit-identical
  * to the distributed `explode(shingles) → groupBy(doc, g).count →
  * groupBy(doc)` pipeline (pinned in PropertySpec) — but a document's
  * repetition profile is a property of the ROW, so computing it here
  * removes both hash-agg shuffles from the repetition queries: at 100 TB
  * the stats cost is absorbed into the scan, like any scalar.
  *
  * NULL array → NULL (standard null-intolerant semantics); a NULL token
  * element is DROPPED from its gram — exactly `array_join`'s null
  * handling, which the declarative `shingles` builds on — so the
  * equality with the distributed pipeline holds even on
  * containsNull=true inputs (unreachable from `split()` output; pinned
  * in PropertySpec anyway).
  */
case class GramStats(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("dup_c", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramStats.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStats {
  def compute(toks: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[String, Long]()
    // gram of a token window = array_join semantics: null elements are
    // dropped, remaining tokens single-space-joined
    def gram(from: Int, len: Int): String = {
      val sb = new java.lang.StringBuilder
      var j = 0
      var first = true
      while (j < len) {
        if (!toks.isNullAt(from + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(from + j).toString)
          first = false
        }
        j += 1
      }
      sb.toString
    }
    if (n <= k) {
      counts.put(gram(0, n), 1L)
    } else {
      var i = 0
      while (i <= n - k) {
        counts.merge(gram(i, k), 1L, (a, b) => a + b)
        i += 1
      }
    }
    var total = 0L; var top = 0L; var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      total += c
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, top, dup))
  }

  def gramStats(toks: Column, k: Int): Column =
    SparkBridge.column(GramStats(SparkBridge.expression(toks), k))
}
