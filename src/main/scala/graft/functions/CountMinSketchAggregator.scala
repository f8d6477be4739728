package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.util.hashing.MurmurHash3

/** Count–Min Sketch (Cormode & Muthukrishnan) as a typed `Aggregator`:
  * the fixed-size frequency summary a 100 TB pipeline uses for heavy-hitter
  * detection where an exact `groupBy(key).count()` would shuffle one row
  * per distinct key.
  *
  * The buffer is a depth×width matrix of counters; `reduce` adds a key to
  * one counter per row (seeded MurmurHash3), `merge` is element-wise
  * addition — fully associative/commutative, so Spark executes it as a
  * partial+final aggregation and the shuffle carries exactly one
  * depth×width matrix per partition, independent of cardinality.
  *
  * Guarantees (classic): estimate(k) >= true(k), and with probability
  * 1−δ, estimate(k) <= true(k) + ε·N for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉.
  * Estimates are deterministic for fixed (width, depth, data) — seeds are
  * the row index.
  *
  * Reference analog: none (the reference counts exactly in Postgres at
  * C7's analyze-patterns scale, src/database.py:321-360); this is the
  * scale path for the same surface.
  */
final class CountMinSketchAggregator(width: Int, depth: Int)
    extends Aggregator[String, CountMinSketchAggregator.Buf, Array[Long]] {
  import CountMinSketchAggregator.{Buf, cell}

  override def zero: Buf = Buf(new Array[Long](width * depth))

  override def reduce(b: Buf, key: String): Buf = {
    // null keys are skipped, matching COUNT(col) semantics — a sketch over
    // a nullable column must degrade, not NPE the job
    if (key != null) {
      var d = 0
      while (d < depth) {
        b.cells(d * width + cell(key, d, width)) += 1L
        d += 1
      }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }

  /** The finished sketch is the raw counter matrix (row-major); query it
    * with [[CountMinSketchAggregator.estimate]]. */
  override def finish(b: Buf): Array[Long] = b.cells

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinSketchAggregator {
  final case class Buf(cells: Array[Long])

  private[functions] def cell(key: String, seed: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(key, seed)
    // floorMod keeps the index non-negative for Int.MinValue too
    java.lang.Math.floorMod(h, width)
  }

  /** Point estimate from a finished sketch: min over rows. */
  def estimate(sketch: Array[Long], key: String, width: Int, depth: Int): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + cell(key, d, width))
      if (c < est) est = c
      d += 1
    }
    if (est == Long.MaxValue) 0L else est
  }

  /** Untyped column form: `df.agg(countMinSketch(w, d, col))` → array<long>.
    *
    * NOTE: the udaf path funnels every row through an encoder round-trip of
    * the full depth×width buffer — fine for correctness tests, wrong for the
    * hot path. Production queries use [[sketchPartitioned]]. */
  def countMinSketch(width: Int, depth: Int, key: Column): Column =
    udaf(new CountMinSketchAggregator(width, depth)).apply(key)

  /** The hot-path form: ONE mutable sketch per partition, updated in place
    * per row (plain array stores, no buffer serialization), merged once per
    * partition up a 2-level tree. Output is bit-identical to the udaf form
    * (integer adds are associative/commutative) — pinned in CmsSpec.
    * This is the shape that holds at 100 TB: the driver receives
    * `treeDepth`-level partial merges of fixed 640 KB arrays, never rows.
    */
  def sketchPartitioned(
      keys: org.apache.spark.sql.Dataset[String],
      width: Int, depth: Int): Array[Long] =
    keys.rdd.treeAggregate(new Array[Long](width * depth))(
      seqOp = (buf, key) => {
        if (key != null) {
          var d = 0
          while (d < depth) { buf(d * width + cell(key, d, width)) += 1L; d += 1 }
        }
        buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
}
