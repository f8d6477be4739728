package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` accumulating the exact second-moment sums of a
  * fixed-point-quantized vector column in ONE pass: Σqᵢ per dimension and
  * Σqᵢqⱼ for every upper-triangular (i ≤ j) pair, plus the row count —
  * everything a covariance / Gram / PCA consumer needs, in a fixed-size
  * mergeable buffer (d + d(d+1)/2 longs ≈ 17 KB at d=64).
  *
  * This is the big-n-small-d shape: shuffle volume is one buffer per
  * partition regardless of corpus size, vs the posexplode-self-join
  * alternative that shuffles n·d(d+1)/2 rows. Inputs are pre-quantized
  * longs (callers use floor(x·2²⁰), the scale the embed_covariance
  * DuckDB oracle pins — NOT select_prototypes_scale's 2²⁴), so the
  * integer sums are exact and order-independent — the property that lets
  * a downstream covariance formula hash-match a DuckDB oracle
  * bit-for-bit despite distributed merge order.
  *
  * Strictness contract: nulls are skipped (aggregates degrade like
  * COUNT(col)) but a non-null vector of the WRONG length throws — the
  * DuckDB oracles (embed_covariance/embed_drift via generate_subscripts)
  * include every non-null vector in full, so silently skipping short
  * vectors or truncating long ones would diverge from the oracle with no
  * error. Overflow throws too (Math.addExact/multiplyExact): |x| ≤ 1 ⇒
  * |q| ≤ 2²⁰, |q·q| ≤ 2⁴⁰ ≈ 1.1e12, so the long product sums hold ~8e6
  * rows of worst-case unit-scale values per cell before 2⁶³ — far beyond
  * any single-aggregation fixture here, but a 100 TB run that crossed it
  * now fails loudly instead of publishing a silently wrapped covariance;
  * the remedy there is coarser quantization or corpus splits (the sums
  * merge associatively across splits).
  */
final class VectorOuterSumAggregator(dim: Int)
    extends Aggregator[Seq[Long], VectorOuterSumAggregator.Buf, VectorOuterSumAggregator.Out] {
  import VectorOuterSumAggregator.{Buf, Out}
  private val tri = dim * (dim + 1) / 2

  override def zero: Buf = Buf(new Array[Long](dim), new Array[Long](tri), 0L)

  override def reduce(b: Buf, v: Seq[Long]): Buf = {
    // nulls are skipped (the VectorAvgAggregator null contract); a wrong
    // length is a hard error — the oracle side counts every non-null row
    if (v != null) {
      require(v.length == dim,
        s"VectorOuterSumAggregator(dim=$dim): vector of length ${v.length} — " +
          "filter or fix the input; skipping would silently diverge from the oracle")
      val a = new Array[Long](dim)
      var i = 0
      while (i < dim) { a(i) = v(i); b.sums(i) = Math.addExact(b.sums(i), a(i)); i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        val ai = a(i)
        var j = i
        while (j < dim) {
          b.prods(k) = Math.addExact(b.prods(k), Math.multiplyExact(ai, a(j)))
          k += 1; j += 1
        }
        i += 1
      }
      b.count += 1
    }
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < dim) { x.sums(i) = Math.addExact(x.sums(i), y.sums(i)); i += 1 }
    var k = 0
    while (k < tri) { x.prods(k) = Math.addExact(x.prods(k), y.prods(k)); k += 1 }
    x.count += y.count
    x
  }

  override def finish(b: Buf): Out = Out(b.count, b.sums.toSeq, b.prods.toSeq)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}

object VectorOuterSumAggregator {
  final case class Buf(sums: Array[Long], prods: Array[Long], var count: Long)

  /** n rows, per-dimension Σq, and flattened upper-triangular Σqᵢqⱼ in
    * (i, j ≥ i) row-major order: flat index k = i·d − i(i−1)/2 + (j − i). */
  final case class Out(n: Long, sums: Seq[Long], prods: Seq[Long])

  /** Untyped column form for `df.agg(outerSums(dim, col))`. */
  def outerSums(dim: Int, vec: Column): Column =
    udaf(new VectorOuterSumAggregator(dim)).apply(vec)
}
