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
  * directory count with [[compact]] — the idempotent batch-keyed rewrite
  * of committed batch directories into a `base-<upTo>` directory.
  *
  * Compaction layout: at most one LIVE `base-K` directory (the one with
  * the highest K that carries a `_SUCCESS` marker) holding the union of
  * batches `<= K`; batch directories with id `> K` sit beside it. Every
  * view ([[read]], [[readBefore]]) resolves the live base FIRST and then
  * ignores batch directories with id `<= K` and older/unfinished bases —
  * so a compaction that crashed mid-way (new base fully written but old
  * directories not yet deleted, or new base half-written with no
  * `_SUCCESS`) never double-counts or loses rows.
  */
object BatchKeyedStore {

  def batchPath(dir: String, batchId: Long): String =
    f"$dir/batch-$batchId%05d"

  private def basePath(dir: String, upTo: Long): String =
    f"$dir/base-$upTo%05d"

  /** Idempotent per-batch write: overwrite this batch's directory. */
  def write(df: DataFrame, dir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(batchPath(dir, batchId))

  private def fsOf(spark: SparkSession, dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Directory listing resolved against the compaction layout: the live
    * base (highest `base-K` with a `_SUCCESS` marker), plus every
    * `batch-i` with `K < i` (`i < before` when a bound is given).
    * Returns (baseUpTo, basePathOpt, batchPaths). */
  private def listView(spark: SparkSession, dir: String,
      before: Option[Long]): (Long, Option[String], Seq[String]) = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return (-1L, None, Nil)
    val entries = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
    val liveBase = entries
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("base-"))
          n.stripPrefix("base-").toLongOption
            // only a finished base counts: a compaction that crashed
            // mid-write leaves no _SUCCESS and stays invisible
            .filter(_ => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
            .filter(k => before.forall(k < _))
            .map(k => (k, p.toString))
        else None
      }
      .sortBy(_._1).lastOption
    val baseUpTo = liveBase.map(_._1).getOrElse(-1L)
    val batches = entries.flatMap { p =>
      val n = p.getName
      if (n.startsWith("batch-"))
        n.stripPrefix("batch-").toLongOption
          .filter(i => i > baseUpTo && before.forall(i < _))
          .map(i => (i, p.toString))
      else None
    }.sortBy(_._1).map(_._2).toSeq
    (baseUpTo, liveBase.map(_._2), batches)
  }

  /** The replay-safe probe view: union of the live base and batch
    * directories strictly before `batchId`; None when nothing earlier
    * exists. The explicit schema keeps the read well-defined even when
    * an earlier batch admitted zero rows (an empty parquet directory).
    * A base is eligible only when its covered range (`<= K`) lies
    * strictly before `batchId` — under sequential AvailableNow batches
    * that is every base that exists, since [[compact]] is called between
    * drains with `upTo` = a committed batch id. */
  def readBefore(spark: SparkSession, dir: String, batchId: Long,
      schema: StructType): Option[DataFrame] = {
    val (_, base, batches) = listView(spark, dir, Some(batchId))
    val paths = base.toSeq ++ batches
    if (paths.isEmpty) None
    else Some(spark.read.schema(schema).parquet(paths: _*))
  }

  /** The consumer view: the live base plus every later batch directory.
    * Visibility is at-least-once for the newest directory: a batch fully
    * written by a crashed attempt whose checkpoint commit never landed is
    * included, and the replay rewrites it with identical rows (never a
    * duplicate, never a loss). A consumer that must see committed batches
    * only uses [[readCommitted]] with the stream's checkpoint. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val (_, base, batches) = listView(spark, dir, None)
    val paths = base.toSeq ++ batches
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Exactly-committed consumer view: [[read]] bounded by the streaming
    * checkpoint's commit log — only batch directories whose id appears
    * under `<checkpoint>/commits/` are visible, closing [[read]]'s
    * at-least-once window (an uncommitted directory written by a crashed
    * attempt stays invisible until its replay commits). */
  def readCommitted(spark: SparkSession, dir: String, schema: StructType,
      checkpointDir: String): DataFrame =
    lastCommitted(spark, checkpointDir) match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(last) =>
        val (_, base, batches) = listView(spark, dir, Some(last + 1))
        val paths = base.toSeq ++ batches
        if (paths.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(paths: _*)
    }

  /** Highest batch id with a commit entry in the checkpoint (the commit
    * is the LAST thing Structured Streaming writes for a batch, so every
    * store directory with this id or lower is complete). */
  def lastCommitted(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val (fs, _) = fsOf(spark, checkpointDir)
    val commits = new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    if (!fs.exists(commits)) return None
    fs.listStatus(commits).flatMap(s => s.getPath.getName.toLongOption)
      .sorted.lastOption
  }

  /** Compact every directory covering batches `<= upTo` (the live base
    * plus batch directories) into ONE `base-<upTo>` directory, then
    * delete the subsumed directories. Crash-safe in every position:
    *  - the new base is written first and only counts once its
    *    `_SUCCESS` lands (a half-written base is invisible);
    *  - readers resolve the HIGHEST finished base, so the moment
    *    `base-<upTo>` is live, the old base and `batch-i (i <= upTo)`
    *    directories are ignored whether or not they are deleted yet;
    *  - re-running the same compact overwrites the same base directory
    *    (idempotent batch-keyed rewrite, the [[write]] argument).
    * `upTo` must be a COMMITTED batch id (from [[lastCommitted]] or the
    * caller's own sequencing): compacting an uncommitted batch would
    * bake a to-be-replayed directory into the base. No-op when nothing
    * covers `<= upTo`. `numFiles` bounds the base's file count — the
    * small-file shedding a long-lived stream needs. */
  def compact(spark: SparkSession, dir: String, schema: StructType,
      upTo: Long, numFiles: Int = 4): Unit = {
    val (baseUpTo, base, batches) = listView(spark, dir, Some(upTo + 1))
    if (baseUpTo >= upTo) return // already compacted this far
    val paths = base.toSeq ++ batches
    if (paths.isEmpty) return
    val union = spark.read.schema(schema).parquet(paths: _*)
    union.coalesce(numFiles).write.mode("overwrite")
      .parquet(basePath(dir, upTo))
    // the new base is live; everything it subsumes is dead weight
    val (fs, root) = fsOf(spark, dir)
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val dead =
        (n.startsWith("batch-") &&
          n.stripPrefix("batch-").toLongOption.exists(_ <= upTo)) ||
        (n.startsWith("base-") &&
          n.stripPrefix("base-").toLongOption.exists(_ < upTo))
      if (dead) { fs.delete(p, true); () }
    }
  }
}
