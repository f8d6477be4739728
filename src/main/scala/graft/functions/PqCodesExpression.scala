package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** Product-quantization code assignment as ONE codegen'd pass per row —
  * the hot path of [[graft.operators.PqIndex]].
  *
  * Semantics (bit-identical to the declarative HOF spec it replaces,
  * PqIndexSpec pins the results): L2-normalize the vector with the
  * engine's sequential double fold (any NULL element or a zero norm →
  * the zero vector, matching the `when(nrm > 0)` convention), then for
  * each of M contiguous subvectors pick the codebook centroid with the
  * smallest L2 distance (sequential (x−y)² fold, ties → lowest code).
  *
  * Why an expression and not `transform`/`aggregate` HOFs: Catalyst
  * evaluates higher-order functions interpreted (no codegen), and nested
  * lambdas re-evaluate their free subtrees per element — an M×K nearest-
  * centroid search whose inner lambda embeds the normalize-and-slice
  * tree walks the vector O(M·K·D) times per row (measured: minutes per
  * 2000-row encode at dim 64). This expression is M·K·(D/M) multiply-
  * adds in a flat loop inside whole-stage codegen — scan speed, the same
  * treatment [[HyperplaneBucket]]/[[SimHash16]] give their hot loops.
  *
  * A NULL vector is NULL (standard null-intolerant semantics; callers
  * filter or coalesce). The codebook rides the plan as a reference
  * object — one copy per plan, not per centroid term.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vn = PqCodes.normalized(input.asInstanceOf[ArrayData], elemIsFloat)
    new GenericArrayData(PqCodes.assign(vn, codebooks))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqCodes.assign(" +
        s"graft.functions.PqCodes.normalized($c, $elemIsFloat), $cbRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Training-side variant: array of (normalized subvector, code) structs,
  * one per subspace — `posexplode` turns it into the (m, sv, cid) rows
  * the Lloyd mean aggregation groups, without re-walking the vector per
  * subspace. Same normalize/assign core as [[PqCodes]]. */
case class PqEncodeDetail(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sv", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("code", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pq_encode_detail"

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any =
    PqCodes.detail(input.asInstanceOf[ArrayData], codebooks, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqCodes.detail($c, $cbRef, $elemIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {

  /** Sequential-fold L2 normalize; NULL element or zero norm → zeros
    * (the engine's `when(nrm > 0)` convention). */
  def normalized(v: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    var sq = 0.0
    while (i < n) {
      if (v.isNullAt(i)) return new Array[Double](n)
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x
      sq += x * x
      i += 1
    }
    val nrm = math.sqrt(sq)
    if (nrm > 0.0) {
      i = 0
      while (i < n) { out(i) = out(i) / nrm; i += 1 }
      out
    } else new Array[Double](n)
  }

  /** Nearest-centroid code per subspace over a normalized vector
    * (sequential (x−y)² fold, strict `<` keeps the lowest code on ties). */
  def assign(vn: Array[Double], cb: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cb.length
    val sub = if (m > 0) cb(0)(0).length else 0
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      val book = cb(mi)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        val lim = math.min(cent.length, math.max(0, vn.length - off))
        while (i < lim) {
          val diff = vn(off + i) - cent(i)
          d += diff * diff
          i += 1
        }
        // short row tail: centroid dims beyond the vector read as 0.0
        while (i < cent.length) { d += cent(i) * cent(i); i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    codes
  }

  def detail(v: ArrayData, cb: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val vn = normalized(v, isFloat)
    val codes = assign(vn, cb)
    val sub = cb(0)(0).length
    new GenericArrayData(Array.tabulate[Any](cb.length) { mi =>
      val sv = new Array[Double](sub)
      var i = 0
      while (i < sub) {
        val idx = mi * sub + i
        sv(i) = if (idx < vn.length) vn(idx) else 0.0
        i += 1
      }
      new GenericInternalRow(Array[Any](new GenericArrayData(sv), codes(mi)))
    })
  }

  def pqCodes(v: Column, cb: Array[Array[Array[Double]]]): Column =
    SparkBridge.column(PqCodes(SparkBridge.expression(v), cb))

  def pqEncodeDetail(v: Column, cb: Array[Array[Array[Double]]]): Column =
    SparkBridge.column(PqEncodeDetail(SparkBridge.expression(v), cb))
}
