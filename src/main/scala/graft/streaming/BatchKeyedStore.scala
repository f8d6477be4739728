package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch-id-keyed parquet store — the idempotent-write layout both
  * foreachBatch screens ([[StreamingSpanScreen]], [[StreamingUrlScreen]])
  * append through.
  *
  * A plain `mode("append")` inside foreachBatch is only at-least-once:
  * Structured Streaming replays a micro-batch whose checkpoint commit
  * never landed, and the replayed append duplicates the first attempt's
  * rows. Keying every write by the (checkpoint-stable) `batchId` and
  * writing with OVERWRITE makes the replay idempotent — attempt two
  * recomputes the same rows and replaces attempt one's directory,
  * whatever prefix of it was written.
  *
  * The replay-safety argument needs one more piece: the store PROBE
  * inside a batch must see only batches strictly BEFORE the current one
  * ([[readBefore]]). If the probe read its own batch's keys (present
  * whenever the crash hit after the store write but before the
  * checkpoint commit), the replayed anti-join would drop every row the
  * first attempt admitted and overwrite the doc directory with nothing —
  * losing the batch. Restricting the probe to earlier batches keeps the
  * recompute byte-identical across any crash position: under
  * `Trigger.AvailableNow` batches run sequentially, so every directory
  * with a smaller id is complete.
  *
  * At 100 TB the layout is unchanged — per-batch directories under a
  * hash-bucketed table root; readers list directories (a metadata
  * operation), never rows. [[readBefore]]'s multi-path read is ONE scan
  * relation over all listed roots (a single shared file index), so plan
  * size does not grow with batch count; a long-lived stream bounds the
  * directory count the standard way — periodic compaction of committed
  * batch directories into a base directory (itself an idempotent
  * batch-keyed rewrite), exactly the hygiene any streaming table store
  * runs.
  */
object BatchKeyedStore {

  def batchPath(dir: String, batchId: Long): String =
    f"$dir/batch-$batchId%05d"

  /** Idempotent per-batch write: overwrite this batch's directory. */
  def write(df: DataFrame, dir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(batchPath(dir, batchId))

  /** The replay-safe probe view: union of batch directories strictly
    * before `batchId`; None when no earlier batch exists. The explicit
    * schema keeps the read well-defined even when an earlier batch
    * admitted zero rows (an empty parquet directory). */
  def readBefore(spark: SparkSession, dir: String, batchId: Long,
      schema: StructType): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch-") &&
          n.stripPrefix("batch-").toLongOption.exists(_ < batchId)
      }
    if (dirs.isEmpty) None
    else Some(spark.read.schema(schema).parquet(dirs.map(_.toString).toSeq: _*))
  }

  /** The consumer view: every committed batch in the store. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
}
