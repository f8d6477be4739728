package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct 64-bit hashes of the k-token shingles of a token
  * array, in one pass with no intermediate shingle strings.
  *
  * Semantically equal (modulo 64-bit hash collisions, P ≈ m²/2⁶⁵) to
  *
  * {{{ array_sort(array_distinct(transform(shingles(toks, k), hash64))) }}}
  *
  * but the declarative chain materializes every shingle string
  * (`array_join` + `slice` per position, interpreted lambda per element)
  * while this expression hashes token bytes in place (FNV-1a with a 0x20
  * separator — identical to hashing the space-joined shingle's UTF-8
  * bytes). This is the internal representation similarity joins shuffle
  * and compare at scale: 8 bytes per feature, long equi-join keys, inputs
  * ready for [[SortedIntersectSize]]. Hash choice is engine-internal —
  * oracle comparisons always happen on final ids/scores, never on the
  * hashed features.
  *
  * Docs shorter than k produce the single whole-document shingle, matching
  * [[TextFunctions.shingles]].
  */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  @inline private def fnvBytes(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Hash of tokens[start..start+len) joined by ' ', without building the
    * joined string. */
  private def shingleHash(toks: Array[Array[Byte]], start: Int, len: Int): Long = {
    var h = FnvOffset
    var i = 0
    while (i < len) {
      if (i > 0) { h ^= 0x20L; h *= FnvPrime }
      h = fnvBytes(h, toks(start + i))
      i += 1
    }
    h
  }

  private val EmptyBytes = Array.empty[Byte]

  /** Static entry point shared by interpreted eval and generated code.
    * A null token element hashes as the empty byte string (array_join's
    * null-drop analog at the byte level) rather than NPE-ing the task —
    * unreachable from split() output, but the type accepts
    * containsNull=true and the function is SQL-exposed. */
  def compute(toksData: ArrayData, k: Int): ArrayData = {
    val n = toksData.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) =
        if (toksData.isNullAt(i)) EmptyBytes
        else toksData.getUTF8String(i).getBytes
      i += 1
    }
    val m = if (n <= k) 1 else n - k + 1
    val out = new Array[Long](m)
    if (n <= k) out(0) = shingleHash(toks, 0, n)
    else {
      var s = 0
      while (s < m) { out(s) = shingleHash(toks, s, k); s += 1 }
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

object HashedShinglesFunctions {
  /** Sorted distinct hashed k-shingles of a token-array column. */
  def hashedShingles(toks: Column, k: Int): Column =
    SparkBridge.column(HashedShingles(SparkBridge.expression(toks), k))
}
