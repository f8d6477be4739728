package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Size of the intersection of two SORTED, DISTINCT arrays (string or
  * long elements), by two-pointer merge: O(n+m) comparisons, zero per-row
  * allocation, fully codegen'd. `array_intersect` builds a hash set per
  * call — on a similarity-join verify stage running millions of candidate
  * pairs that allocation dominates; this expression is the verify-stage
  * workhorse. Long arrays are the feature-hashed form (shingle →
  * xxhash64), the representation that keeps shuffle volume at 8
  * bytes/element at scale.
  *
  * Preconditions (callers produce inputs via
  * `array_sort(array_distinct(...))`): both arrays ascending and
  * duplicate-free, non-null elements. Result equals
  * `size(array_intersect(a, b))` on such inputs.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  // Null-element guard, active ONLY when a static element type is
  // nullable: getLong on a null slot reads silent garbage and
  // getUTF8String NPEs opaquely. Callers produce
  // array_sort(array_distinct(...)) of non-null-element arrays, whose
  // static type is tight — for them this emits nothing.
  private lazy val mayHaveNulls = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val types = Seq(left, right).map(_.dataType)
    val ok = types.forall {
      case ArrayType(StringType, _) | ArrayType(LongType, _) => true
      case _ => false
    } && types.map { case ArrayType(e, _) => e; case t => t }.distinct.size == 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<long> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements(); val m = ys.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (mayHaveNulls && (xs.isNullAt(i) || ys.isNullAt(j)))
        throw new IllegalArgumentException(
          s"$prettyName: null element at merge position ($i, $j) — inputs " +
            "must be sorted distinct arrays with non-null elements")
      val cmp =
        if (isLong) java.lang.Long.compare(xs.getLong(i), ys.getLong(j))
        else xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val compare =
        if (isLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      val nullGuard = if (!mayHaveNulls) "" else
        s"""
          |if ($a.isNullAt($i) || $b.isNullAt($j)) {
          |  throw new IllegalArgumentException(
          |    "sorted_intersect_size: null element at merge position (" + $i +
          |    ", " + $j + ") — inputs must be sorted distinct arrays with " +
          |    "non-null elements");
          |}""".stripMargin
      s"""
        |int $n = $a.numElements(); int $m = $b.numElements();
        |int $i = 0; int $j = 0; int $c = 0;
        |while ($i < $n && $j < $m) {
        |  $nullGuard
        |  int $cmp = $compare;
        |  if ($cmp == 0) { $c++; $i++; $j++; }
        |  else if ($cmp < 0) { $i++; } else { $j++; }
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  import org.apache.spark.sql.functions._

  def sortedIntersectSize(a: Column, b: Column): Column =
    SparkBridge.column(SortedIntersectSize(
      SparkBridge.expression(a), SparkBridge.expression(b)))

  /** Jaccard over pre-sorted distinct arrays using the merge-intersect
    * expression; same double formula as [[TextFunctions.jaccard]]. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = sortedIntersectSize(a, b).cast("double")
    val union = size(a).cast("double") + size(b).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }
}
