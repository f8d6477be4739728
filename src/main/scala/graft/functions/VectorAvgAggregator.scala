package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` computing the dimension-wise mean of vector
  * columns — the custom-UDAF surface of the engine (SURVEY §2 H notes no
  * reference op *requires* one; this is the centroid-update primitive the
  * IVF trainer uses).
  *
  * Buffer is a mutable (sums, count) pair merged associatively, so Spark
  * runs it as a partial+final aggregation: shuffle volume is one
  * dim-length array per partition per group — compare the posexplode
  * alternative, which shuffles one row per (vector, dimension).
  */
final class VectorAvgAggregator(dim: Int)
    extends Aggregator[Seq[Double], VectorAvgAggregator.Buf, Seq[Double]] {
  import VectorAvgAggregator.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    // null vectors are skipped, not NPE'd — the embeddings column is
    // nullable by schema and an aggregate must degrade like COUNT(col)
    // (same contract as CountMinSketchAggregator's null-key skip)
    if (v != null) {
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) { b.sums(i) += v(i); i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.count == 0L) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.count).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorAvgAggregator {
  final case class Buf(sums: Array[Double], var count: Long)

  /** Untyped column form usable in `df.groupBy(...).agg(vectorAvg(dim, col))`. */
  def vectorAvg(dim: Int, vec: Column): Column =
    udaf(new VectorAvgAggregator(dim)).apply(vec)
}
