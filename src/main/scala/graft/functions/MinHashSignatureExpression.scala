package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array: for seed s ∈ [0, m),
  * `min(md5("s|" || shingle))` as a lowercase hex string — byte-for-byte
  * the declarative spec
  *
  * {{{ array((0 until m).map(seed =>
  *       array_min(transform(sh, x => md5(concat(lit(s"seed|"), x))))): _*) }}}
  *
  * (TextFunctions.minhashSignature's original form, reproduced by the
  * DuckDB oracles as `list_min(list_transform(...))`), but computed in ONE
  * pass over the shingles with a reused MessageDigest — the m interpreted
  * higher-order transforms each materialized an n-element hex-string array
  * per row and re-walked the input per seed.
  *
  * An EMPTY shingle array yields an array of m nulls (array_min of empty
  * is null), matching the spec. A NULL input yields NULL (standard
  * null-intolerant semantics) — `TextFunctions.minhashSignature` wraps
  * with coalesce to restore the spec's array-of-nulls there.
  */
case class MinHashSignature(child: Expression, m: Int) extends UnaryExpression {
  require(m >= 1, "signature length must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> shingles, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  // seed prefixes ("0|", "1|", …) computed once per expression instance
  // and shipped into generated code as a reference object — rebuilding
  // them per row allocated m byte arrays per input row for nothing
  private lazy val prefixesArr: Array[Array[Byte]] =
    Array.tabulate(m)(s => (s.toString + "|").getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], prefixesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixes", prefixesArr, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(shingles: ArrayData, prefixes: Array[Array[Byte]]): ArrayData = {
    val m = prefixes.length
    val n = shingles.numElements()
    // The running minimum per seed is tracked on the RAW 16-byte digest:
    // lowercase-hex encoding maps each byte to an ordered digit pair
    // ('0'<…<'9'<'a'<…<'f' in ASCII), so unsigned-byte lexicographic
    // order on digests IS the hex-string order the spec (and the DuckDB
    // oracle) minimize over. Only the m winners are hex-encoded at the
    // end — the former per-(shingle, seed) 32-char String allocation was
    // the dominant cost of the signature scan. One candidate buffer is
    // reused across all digests (digest(buf,…) writes in place); a new
    // minimum swaps buffers instead of copying.
    val mins = new Array[Array[Byte]](m)
    var cand = new Array[Byte](16)
    val md = Digests.md5.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val bytes = shingles.getUTF8String(i).getBytes
        var seed = 0
        while (seed < m) {
          md.reset()
          md.update(prefixes(seed))
          md.update(bytes)
          md.digest(cand, 0, 16)
          if (mins(seed) == null) mins(seed) = cand.clone()
          else if (lessThanUnsigned(cand, mins(seed))) {
            val t = mins(seed); mins(seed) = cand; cand = t
          }
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(b =>
      if (b == null) null else UTF8String.fromString(toHex(b))))
  }

  private def lessThanUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(i * 2) = HexDigits(b >>> 4)
      out(i * 2 + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def minhashSignature(shingles: Column, m: Int): Column =
    SparkBridge.column(MinHashSignature(SparkBridge.expression(shingles), m))
}
