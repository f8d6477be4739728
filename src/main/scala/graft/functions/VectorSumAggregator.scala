package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` accumulating exact per-dimension long sums (plus the
  * row count) of a fixed-point-quantized vector column — the centroid-
  * update primitive for k-means-style clustering.
  *
  * The 100 TB shape: `groupBy(cluster).agg(vectorSum(...))` keeps ONE
  * (d+1)-long buffer per cluster per partition with map-side combine, so
  * the centroid update shuffles k·partitions fixed-size buffers instead of
  * the n·d rows a posexplode/groupBy(cluster, pos) update would — at a
  * billion 64-dim vectors that is ~10⁴ buffers vs 6.4e10 shuffled rows.
  * Integer sums are exact and order-independent, so a downstream
  * floor-divided centroid hash-matches a DuckDB oracle bit-for-bit.
  *
  * Strictness contract (same as [[VectorOuterSumAggregator]]): nulls are
  * skipped (aggregates degrade like COUNT(col)); a non-null vector of the
  * wrong length throws rather than silently diverging from an oracle that
  * counts every non-null row; sums use Math.addExact so overflow fails
  * loudly (|q| ≤ 2²⁴ ⇒ ~5e11 worst-case unit-scale rows per dimension
  * before 2⁶³ — beyond that, split the corpus and merge the sums).
  */
final class VectorSumAggregator(dim: Int)
    extends Aggregator[Seq[Long], VectorSumAggregator.Buf, VectorSumAggregator.Out] {
  import VectorSumAggregator.{Buf, Out}

  override def zero: Buf = Buf(new Array[Long](dim), 0L)

  override def reduce(b: Buf, v: Seq[Long]): Buf = {
    if (v != null) {
      require(v.length == dim,
        s"VectorSumAggregator(dim=$dim): vector of length ${v.length} — " +
          "filter or fix the input; skipping would silently diverge from the oracle")
      var i = 0
      while (i < dim) { b.sums(i) = Math.addExact(b.sums(i), v(i)); i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < dim) { x.sums(i) = Math.addExact(x.sums(i), y.sums(i)); i += 1 }
    x.count += y.count
    x
  }

  override def finish(b: Buf): Out = Out(b.count, b.sums.toSeq)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}

object VectorSumAggregator {
  final case class Buf(sums: Array[Long], var count: Long)
  final case class Out(n: Long, sums: Seq[Long])

  /** Untyped column form for `df.groupBy(...).agg(vectorSum(dim, col))`. */
  def vectorSum(dim: Int, vec: Column): Column =
    udaf(new VectorSumAggregator(dim)).apply(vec)
}
