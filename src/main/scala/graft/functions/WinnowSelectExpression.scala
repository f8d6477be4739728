package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003) in
  * one pass over the token array: hash every k-token gram to the unsigned
  * 32-bit value of its md5's first 4 bytes, slide a window of w
  * consecutive gram hashes, select each window's minimum with LEFTMOST
  * tie-break, and return the distinct selected hashes in first-occurrence
  * order.
  *
  * Bit-identical to the declarative chain it replaces (and to the DuckDB
  * oracle, which stays on that form):
  *
  * {{{
  * array_distinct(transform(sequence(0, size(pk) - w),
  *   i -> array_min(slice(pk, i + 1, w)) div 1048576))
  * // pk = transform(shingles(toks, k), (g, i) ->
  * //        conv(substring(md5(g), 1, 8), 16, 10) * 1048576 + i)
  * }}}
  *
  * but without materializing gram strings (the digest is fed token bytes
  * + a 0x20 separator incrementally), without the O(w) `slice` allocation
  * per window (a monotonic deque gives amortized O(1) window minima), and
  * with the 2^20 position packing folded into plain long comparisons.
  * Fewer than w grams select nothing (the caller's explode drops the
  * document), matching the declarative form's `size(pk) >= w` filter.
  * Docs with <= k tokens produce the single whole-document gram, matching
  * [[TextFunctions.shingles]].
  *
  * Evaluated once per document; the md5 work dominates, so CodegenFallback
  * costs nothing measurable.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "gram size and window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // nullable-TYPED elements are accepted (a parquet round-trip reads any
    // array back as containsNull=true even when no slot is null) and
    // guarded at runtime instead — the CosineSimilarity posture; a
    // containsNull=false analysis rejection would bar persisted token arrays
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.sql}")
  }

  // emitted only when the static element type is nullable; the in-plan
  // split()-derived callers compile without the branch
  private lazy val mayHaveNulls = child.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val tokBytes = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      if (mayHaveNulls && toks.isNullAt(t)) throw new IllegalArgumentException(
        s"$prettyName: null token at position $t — pre-filter malformed " +
          "token arrays before winnowing")
      tokBytes(t) = toks.getUTF8String(t).getBytes
      t += 1
    }
    val n = if (m <= k) 1 else m - k + 1 // gram count (shingles semantics)
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // position-packing envelope: packed(i) = h·2²⁰ + i, so gram positions
    // beyond 2²⁰ would bleed into the hash bits and silently corrupt
    // fingerprints — fail loudly; callers pre-chunk monster docs (the
    // chunk_windows path documented on dedup_winnowing)
    if (n > (1 << 20)) throw new IllegalArgumentException(
      s"$prettyName: $n grams exceed the 2^20 position envelope — " +
        "pre-chunk the document (chunk_windows) before winnowing")

    val md = Digests.md5.get()
    val sep = Array[Byte](0x20)
    // packed(i) = u32(md5(gram_i)[0..4]) * 2^20 + i
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val len = math.min(k, m) // whole-doc gram when m <= k
      var j = 0
      while (j < len) {
        if (j > 0) md.update(sep)
        md.update(tokBytes(i + j))
        j += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      packed(i) = h * 1048576L + i
      i += 1
    }

    // monotonic deque sliding-window minimum; packed values are distinct
    // (position low bits), so min is unique and leftmost-tie-break is the
    // packing's h*2^20+pos order — identical to array_min over the window
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n - w + 2)
    i = 0
    while (i < n) {
      while (tail > head && packed(deque(tail - 1)) >= packed(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val h = packed(deque(head)) / 1048576L
        if (seen.add(h)) out += h
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  /** See [[WinnowSelect]]. */
  def winnowSelect(toks: Column, k: Int, w: Int): Column =
    SparkBridge.column(WinnowSelect(SparkBridge.expression(toks), k, w))
}
