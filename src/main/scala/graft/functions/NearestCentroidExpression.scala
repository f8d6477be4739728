package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** Exact nearest-centroid search for the k-means assignment step:
  * `struct(idx, dist)` of the centroid minimizing squared L2 distance to
  * a quantized vector, over a FLATTENED k×d centroid matrix (row-major
  * array&lt;long&gt;, one broadcast row — data, not literals).
  *
  * Why an expression and not transform/zip_with/aggregate: the HOF chain
  * allocates a d-long intermediate array per centroid per row — at the
  * adaptive-k sizes dedup blocking needs (k = n/64: ~3k centroids at the
  * 100× fixture) that is k·d longs of garbage per ROW and it measures as
  * the whole operator. This loop is allocation-free and codegen'd: k·d
  * long subtract/multiply/adds per row, nothing else.
  *
  * Semantics (MUST match the unrolled DuckDB oracle): exact integer
  * arithmetic, first minimum wins (ties to the lowest index — the
  * `ORDER BY d, c` rule), 0-based idx into the matrix order. d is the
  * query vector's length; the matrix length must be a multiple of it. */
case class NearestCentroidExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(q: Any, m: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cm = m.asInstanceOf[ArrayData]
    val d = qv.numElements()
    if (d > 0 && cm.numElements() % d != 0)
      throw new IllegalArgumentException(
        s"nearest_centroid: matrix length ${cm.numElements()} is not a multiple of " +
          s"the query dimension $d — dimension mismatch between model and vectors")
    val k = if (d == 0) 0 else cm.numElements() / d
    if (k == 0) null
    else {
      var best = 0
      var bestDist = Long.MaxValue
      var j = 0
      while (j < k) {
        var s = 0L
        var i = 0
        val off = j * d
        while (i < d) {
          val delta = qv.getLong(i) - cm.getLong(off + i)
          s += delta * delta
          i += 1
        }
        if (s < bestDist) { bestDist = s; best = j }
        j += 1
      }
      InternalRow(best, bestDist)
    }
  }

  override def nullable: Boolean = true // empty inputs → null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, m) => {
      val d = ctx.freshName("d"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val s = ctx.freshName("s")
      val delta = ctx.freshName("delta")
      val best = ctx.freshName("best"); val bestDist = ctx.freshName("bestDist")
      val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      s"""
        |int $d = $q.numElements();
        |if ($d > 0 && $m.numElements() % $d != 0) {
        |  throw new IllegalArgumentException(
        |    "nearest_centroid: matrix length " + $m.numElements() +
        |    " is not a multiple of the query dimension " + $d +
        |    " — dimension mismatch between model and vectors");
        |}
        |int $k = ($d == 0) ? 0 : $m.numElements() / $d;
        |if ($k == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $best = 0;
        |  long $bestDist = Long.MAX_VALUE;
        |  for (int $j = 0; $j < $k; $j++) {
        |    long $s = 0L;
        |    int $off = $j * $d;
        |    for (int $i = 0; $i < $d; $i++) {
        |      long $delta = $q.getLong($i) - $m.getLong($off + $i);
        |      $s += $delta * $delta;
        |    }
        |    if ($s < $bestDist) { $bestDist = $s; $best = $j; }
        |  }
        |  ${ev.value} = new $rowClass(new Object[] {
        |    java.lang.Integer.valueOf($best), java.lang.Long.valueOf($bestDist) });
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidExpression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidExpression {
  /** Column form: struct(idx, dist) of the nearest centroid in the
    * flattened row-major matrix `cflat` (k·d longs) to the quantized
    * vector `qv` (d longs). */
  def nearestCentroid(qv: Column, cflat: Column): Column =
    SparkBridge.column(NearestCentroidExpression(
      SparkBridge.expression(qv), SparkBridge.expression(cflat)))
}
