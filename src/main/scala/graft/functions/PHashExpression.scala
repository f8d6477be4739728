package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** 16-bit perceptual hash (dHash geometry) of a binary payload, reading
  * the bytes DIRECTLY — the codegen form of
  * [[graft.operators.MultiModal.pHash16]]'s probe/cell/gradient semantics.
  *
  * The hex-string spelling this replaces (`lower(hex(payload))` + 80
  * `substring`+`conv` probes) materializes a string 2× the payload per row
  * and parses 160 hex chars; at a corpus scan that is most of the
  * operator's cost. Here the same 80 probes are 80 array reads inside one
  * WholeStageCodegen loop — no intermediate allocation, bytes touched
  * once. The DuckDB oracle keeps the hex spelling (byte-identical
  * semantics; spec-pinned against this expression).
  *
  * Geometry (MUST stay bit-identical to the oracle): probe position
  * g ∈ [0, 80) reads unsigned byte `payload[(g·(len−1)) div 79]`; cell k
  * sums probes 4k..4k+3; bit r·4+c is set iff cell(r·5+c) < cell(r·5+c+1)
  * — 4 horizontal gradients per row × 4 rows. An EMPTY payload has no
  * pixel surface: the hash is null (callers filter, the same
  * unscorable-row rule the quality scorers use).
  */
case class PHash16Expression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty payload → null
  override def prettyName: String = "phash16"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length == 0) null else PHashCompute.compute(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val cells = ctx.freshName("cells")
      val g = ctx.freshName("g")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val nm1 = ctx.freshName("nm1")
      val res = ctx.freshName("res")
      s"""
        |if ($b.length == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $nm1 = (long) $b.length - 1L;
        |  long[] $cells = new long[20];
        |  for (int $g = 0; $g < 80; $g++) {
        |    $cells[$g >> 2] += ($b[(int) (($g * $nm1) / 79L)] & 0xFF);
        |  }
        |  long $res = 0L;
        |  for (int $r = 0; $r < 4; $r++) {
        |    for (int $c = 0; $c < 4; $c++) {
        |      if ($cells[$r * 5 + $c] < $cells[$r * 5 + $c + 1]) {
        |        $res |= (1L << ($r * 4 + $c));
        |      }
        |    }
        |  }
        |  ${ev.value} = $res;
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PHash16Expression =
    copy(child = newChild)
}

/** Shared interpreted implementation — the eval path, and the reference
  * the codegen loop and the specs are pinned against. */
object PHashCompute {
  def compute(bytes: Array[Byte]): Long = {
    val nm1 = bytes.length - 1L
    val cells = new Array[Long](20)
    var g = 0
    while (g < 80) {
      cells(g >> 2) += (bytes((g * nm1 / 79L).toInt) & 0xFF)
      g += 1
    }
    var res = 0L
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        if (cells(r * 5 + c) < cells(r * 5 + c + 1)) res |= (1L << (r * 4 + c))
        c += 1
      }
      r += 1
    }
    res
  }
}

object PHashExpression {
  /** Column form: 16-bit perceptual hash of a binary column (null for
    * null or empty payloads). */
  def pHash16Col(blob: Column): Column =
    SparkBridge.column(PHash16Expression(SparkBridge.expression(blob)))
}
