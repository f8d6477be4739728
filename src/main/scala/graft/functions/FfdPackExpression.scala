package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._

/** First-fit-decreasing bin packing over one shard's document list, as a
  * single native pass: input is the SORTED per-shard array
  * `struct(sortKey, doc_id, n_tok)` (callers sort by `(-n_tok, doc_id)`
  * via `sort_array`, the "decreasing" order), output is one assignment
  * struct `(doc_id, n_tok, bid)` per document with 1-based bin ids in bin
  * CREATION order — bit-identical to the sequential fold the DuckDB
  * oracle replays (`TrainingDataQueries.FfdSqlCtes`).
  *
  * Why an expression and not a SQL `aggregate(...)` fold: the fold's
  * accumulator carries the growing assignment array, and every
  * `array_append` copies it — O(n²) bytes per shard, which measured as a
  * multi-minute stall at the 10× rehearsal fixture (6250 docs/shard).
  * This pass keeps mutable state: a segment tree over bin residual
  * capacities finds the LEFTMOST bin that fits in O(log bins), so a
  * shard packs in O(n log n) time and O(n) space. Oversize documents
  * (n_tok > capacity) open a singleton bin whose residual goes negative,
  * which no later (smaller) document can enter — the same outcome as the
  * oracle's `load + n_tok <= C` first-fit test.
  *
  * Evaluated once per SHARD row (not per document), so CodegenFallback
  * costs nothing measurable.
  */
case class FfdPack(child: Expression, capacity: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // nullable-TYPED elements are accepted (a parquet round-trip reads any
    // array back as containsNull=true even when no slot is null) and
    // guarded at runtime instead — the CosineSimilarity posture; a
    // containsNull=false analysis rejection would bar persisted manifests
    case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint,bigint>>, got ${t.sql}")
  }

  // emitted only when the static element type is nullable; the in-plan
  // sort_array(collect_list(...)) callers compile without the branch
  private lazy val mayHaveNulls = child.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("bid", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "ffd_pack"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // segment tree over residual capacities; leaves default to MinValue
    // (bin not yet created) so the leftmost-fit descent skips them
    var size = 1
    while (size < math.max(1, n)) size <<= 1
    val tree = Array.fill(2 * size)(Long.MinValue)
    def set(leaf: Int, v: Long): Unit = {
      var i = leaf + size
      tree(i) = v
      i >>= 1
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i >>= 1 }
    }
    var bins = 0
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (mayHaveNulls && arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at position $i — pre-filter malformed " +
          "manifests before packing")
      val row = arr.getStruct(i, 3)
      val docId = row.getLong(1)
      val nTok = row.getLong(2)
      var b = -1
      if (tree(1) >= nTok) { // leftmost leaf with residual >= n_tok
        var node = 1
        while (node < size) {
          node = if (tree(2 * node) >= nTok) 2 * node else 2 * node + 1
        }
        b = node - size
        set(b, tree(node) - nTok)
      } else { // no bin fits: open a new one (residual may go negative)
        b = bins
        set(b, capacity - nTok)
        bins += 1
      }
      out(i) = new GenericInternalRow(Array[Any](docId, nTok, b + 1L))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FfdPackFunctions {
  /** See [[FfdPack]]. `items`: sorted array<struct<sortKey, doc_id, n_tok>>. */
  def ffdPack(items: Column, capacity: Long): Column =
    SparkBridge.column(FfdPack(SparkBridge.expression(items), capacity))
}
