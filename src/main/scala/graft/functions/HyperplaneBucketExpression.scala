package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH bucket of a vector: one sign bit per plane,
  * rendered as a '0'/'1' string ("0110"). Equal by construction to the
  * declarative spec
  *
  * {{{ concat(planes.map(p => when(dot(v, lit(p)) > 0, "1").otherwise("0"))) }}}
  *
  * (same sequential left-to-right double fold per plane — the planes are
  * ±1.0 exactly, so every product is exact and only the addition order
  * matters, which this loop preserves) but computed in ONE pass over the
  * vector with codegen, instead of `planes` interpreted higher-order
  * aggregates that each re-walk the array.
  *
  * The planes matrix is engine-deterministic (md5 parity of "plane|dim",
  * [[graft.queries.VectorSearchQueries.planeWeight]]) so any engine — and
  * the DuckDB oracle — reproduces buckets bit-for-bit from the spec.
  *
  * Null handling: a NULL vector yields NULL (standard null-intolerant
  * expression semantics), whereas the declarative when/otherwise spec
  * yields the all-zeros bucket. Callers that need spec parity on null
  * vectors wrap with `coalesce(…, lit("0"*planes))` — see
  * `VectorSearchQueries.bucketCol`.
  *
  * Short vectors fold over the common prefix (the same min-length
  * convention as [[CosineSimilarity]]); the zip_with spec instead
  * null-poisons a vector shorter than the planes. Embeddings are
  * fixed-dimension by schema, so the distinction never arises in data.
  *
  * A NULL *element* anywhere in the vector yields the all-zeros bucket,
  * matching the spec exactly: zip_with's `x * y` null-poisons the dot of
  * every plane, and `when(null > 0, …)` routes each to '0'. (Before this
  * was made explicit, a null element read as 0.0 — a silent divergence on
  * containsNull=true arrays; pinned in PropertySpec.)
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty, "need at least one hyperplane")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "hyperplane_bucket"

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val planesArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HyperplaneBucket.compute(
      input.asInstanceOf[ArrayData], planesArr, elemIsFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HyperplaneBucket.compute($c, $planesRef, $elemIsFloat))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  def compute(v: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): String = {
    // spec parity: one null element null-poisons every plane's zip_with
    // dot product, so the whole bucket is zeros
    var k = 0
    val len = v.numElements()
    while (k < len) {
      if (v.isNullAt(k)) {
        val zeros = new Array[Char](planes.length)
        java.util.Arrays.fill(zeros, '0')
        return new String(zeros)
      }
      k += 1
    }
    val sb = new java.lang.StringBuilder(planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      sb.append(if (dot > 0.0) '1' else '0')
      p += 1
    }
    sb.toString
  }

  /** Bucket of a plain vector (rule-time evaluation of the query literal). */
  def bucketOf(q: Seq[Double], planes: Seq[Seq[Double]]): String =
    planes.map { p =>
      val n = math.min(q.length, p.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += q(i) * p(i); i += 1 }
      if (dot > 0.0) '1' else '0'
    }.mkString

  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    SparkBridge.column(HyperplaneBucket(SparkBridge.expression(v), planes))
}
