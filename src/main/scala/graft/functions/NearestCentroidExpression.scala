package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** Exact nearest-centroid search for the k-means assignment step:
  * `struct(idx, dist)` of the centroid minimizing squared L2 distance to
  * a quantized vector, over a FLATTENED k×d centroid matrix (row-major
  * array&lt;long&gt;, one broadcast row — data, not literals) with the
  * model dimension `d` as an explicit literal argument.
  *
  * Why an expression and not transform/zip_with/aggregate: the HOF chain
  * allocates a d-long intermediate array per centroid per row — at the
  * adaptive-k sizes dedup blocking needs (k = n/64: ~3k centroids at the
  * 100× fixture) that is k·d longs of garbage per ROW and it measures as
  * the whole operator. This loop is allocation-free and codegen'd: k·d
  * long subtract/multiply/adds per row, nothing else.
  *
  * `d` is explicit — NOT inferred from the query vector — because
  * inference cannot detect a model/vector dimension mismatch whenever
  * the lengths happen to divide (a 3-dim model against 2-dim vectors
  * reads 3 phantom 2-dim "centroids" from the same 6 longs); with `d`
  * pinned, any query vector of the wrong length throws.
  *
  * Semantics (MUST match the unrolled DuckDB oracle): exact integer
  * arithmetic, first minimum wins (ties to the lowest index — the
  * `ORDER BY d, c` rule), 0-based idx into the matrix order. */
case class NearestCentroidExpression(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (!arraysOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> vector/matrix inputs, " +
          s"got ${first.dataType.sql} and ${second.dataType.sql}")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int dimension, got ${third.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  // Null-element guards are emitted ONLY when the static element type is
  // nullable (transform()-built arrays are, collect-derived literals are
  // not): getLong on a null slot reads silent garbage, the
  // VectorOuterSumAggregator failure class — guard loudly, cost nothing
  // when the type is tight.
  private lazy val qvNullable = first.dataType match {
    case ArrayType(_, n) => n; case _ => false
  }
  private lazy val cmNullable = second.dataType match {
    case ArrayType(_, n) => n; case _ => false
  }

  override def nullSafeEval(q: Any, m: Any, dv: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cm = m.asInstanceOf[ArrayData]
    val d = dv.asInstanceOf[Int]
    if (qv.numElements() != d || d <= 0 || cm.numElements() % d != 0)
      throw new IllegalArgumentException(
        s"nearest_centroid: dimension mismatch between model and vectors — " +
          s"expected d=$d, got a ${qv.numElements()}-element query vector and a " +
          s"${cm.numElements()}-long matrix")
    if (qvNullable) {
      var t = 0
      while (t < d) {
        if (qv.isNullAt(t)) throw new IllegalArgumentException(
          s"nearest_centroid: null element at query-vector position $t — " +
            "quantize from non-null components or pre-filter")
        t += 1
      }
    }
    if (cmNullable) {
      var t = 0
      val nm = cm.numElements()
      while (t < nm) {
        if (cm.isNullAt(t)) throw new IllegalArgumentException(
          s"nearest_centroid: null element at centroid-matrix position $t")
        t += 1
      }
    }
    val k = cm.numElements() / d
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

  override def nullable: Boolean = true // an empty matrix → null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, m, dv) => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val s = ctx.freshName("s")
      val delta = ctx.freshName("delta")
      val best = ctx.freshName("best"); val bestDist = ctx.freshName("bestDist")
      val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      val t = ctx.freshName("t")
      val qvGuard = if (!qvNullable) "" else
        s"""
          |for (int $t = 0; $t < $dv; $t++) {
          |  if ($q.isNullAt($t)) {
          |    throw new IllegalArgumentException(
          |      "nearest_centroid: null element at query-vector position " + $t +
          |      " — quantize from non-null components or pre-filter");
          |  }
          |}""".stripMargin
      val cmGuard = if (!cmNullable) "" else
        s"""
          |for (int $t = 0; $t < $m.numElements(); $t++) {
          |  if ($m.isNullAt($t)) {
          |    throw new IllegalArgumentException(
          |      "nearest_centroid: null element at centroid-matrix position " + $t);
          |  }
          |}""".stripMargin
      s"""
        |if ($q.numElements() != $dv || $dv <= 0 || $m.numElements() % $dv != 0) {
        |  throw new IllegalArgumentException(
        |    "nearest_centroid: dimension mismatch between model and vectors — " +
        |    "expected d=" + $dv + ", got a " + $q.numElements() +
        |    "-element query vector and a " + $m.numElements() + "-long matrix");
        |}
        |$qvGuard
        |$cmGuard
        |int $k = $m.numElements() / $dv;
        |if ($k == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $best = 0;
        |  long $bestDist = Long.MAX_VALUE;
        |  for (int $j = 0; $j < $k; $j++) {
        |    long $s = 0L;
        |    int $off = $j * $dv;
        |    for (int $i = 0; $i < $dv; $i++) {
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
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : NearestCentroidExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCentroidExpression {
  /** Column form: struct(idx, dist) of the nearest centroid in the
    * flattened row-major matrix `cflat` (k·d longs) to the quantized
    * vector `qv` (exactly `dim` longs — anything else throws). */
  def nearestCentroid(qv: Column, cflat: Column, dim: Int): Column =
    SparkBridge.column(NearestCentroidExpression(
      SparkBridge.expression(qv), SparkBridge.expression(cflat),
      SparkBridge.expression(lit(dim))))
}
