package graft

import graft.streaming.BatchKeyedStore
import org.apache.spark.sql.types._

/** The idempotent-write layout under both foreachBatch screens: batchId-
  * keyed overwrite writes plus a strictly-earlier probe view — the two
  * properties that together make a replayed micro-batch a no-op. */
class BatchKeyedStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("k", LongType)))

  test("rewriting the same batchId replaces, never duplicates (replay idempotency)") {
    import spark.implicits._
    val dir = tmpDir("bks") + "/store"
    BatchKeyedStore.write(Seq(1L, 2L).toDF("k"), dir, 0L)
    BatchKeyedStore.write(Seq(3L).toDF("k"), dir, 1L)
    assert(BatchKeyedStore.read(spark, dir, schema).count() == 3L)
    // the replay: batch 1 runs again (deterministic recompute, same rows)
    BatchKeyedStore.write(Seq(3L).toDF("k"), dir, 1L)
    assert(BatchKeyedStore.read(spark, dir, schema).count() == 3L,
      "a replayed batch write must overwrite its own directory, not append")
  }

  test("readBefore excludes the current batch — the crash-after-store-write replay case") {
    import spark.implicits._
    val dir = tmpDir("bks2") + "/store"
    // no store yet: the first batch probes None
    assert(BatchKeyedStore.readBefore(spark, dir, 0L, schema).isEmpty)
    BatchKeyedStore.write(Seq(1L).toDF("k"), dir, 0L)
    // crash position: batch 1 wrote its OWN store dir but the checkpoint
    // commit never landed; the replayed probe must not see batch 1's keys
    // (it would anti-join away the very rows it is recomputing)
    BatchKeyedStore.write(Seq(2L).toDF("k"), dir, 1L)
    val probe = BatchKeyedStore.readBefore(spark, dir, 1L, schema)
    assert(probe.isDefined)
    assert(probe.get.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "the probe view must stop strictly before the current batchId")
    // an empty earlier batch reads fine under the explicit schema
    BatchKeyedStore.write(Seq.empty[Long].toDF("k"), dir, 2L)
    assert(BatchKeyedStore.readBefore(spark, dir, 3L, schema).get.count() == 2L)
  }

  private def dirNames(dir: String): Set[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  test("compact folds committed batches into one base; every view is unchanged") {
    import spark.implicits._
    val dir = tmpDir("bks3") + "/store"
    (0L to 3L).foreach(i => BatchKeyedStore.write(Seq(i * 10, i * 10 + 1).toDF("k"), dir, i))
    val before = BatchKeyedStore.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq

    BatchKeyedStore.compact(spark, dir, schema, upTo = 2L)
    assert(dirNames(dir) == Set("base-00002", "batch-00003"),
      s"batches <= 2 must fold into base-00002, got ${dirNames(dir)}")
    assert(BatchKeyedStore.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq == before,
      "the consumer view must be unchanged by compaction")
    // probe view for the NEXT batch: base + batch-3
    assert(BatchKeyedStore.readBefore(spark, dir, 4L, schema).get.count() == 8L)

    // idempotent: re-running the same compact is a no-op rewrite
    BatchKeyedStore.compact(spark, dir, schema, upTo = 2L)
    assert(BatchKeyedStore.read(spark, dir, schema).count() == 8L)

    // a second compaction folds the old base + later batches
    BatchKeyedStore.compact(spark, dir, schema, upTo = 3L)
    assert(dirNames(dir) == Set("base-00003"))
    assert(BatchKeyedStore.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq == before)
  }

  test("a replayed batch across a compaction recomputes against the base and leaves the state unchanged") {
    import spark.implicits._
    val dir = tmpDir("bks4") + "/store"
    BatchKeyedStore.write(Seq(1L).toDF("k"), dir, 0L)
    BatchKeyedStore.write(Seq(2L).toDF("k"), dir, 1L)
    // crash position: batch 2 wrote its store dir, checkpoint commit never
    // landed; compaction then runs bounded by the commit log (upTo = 1)
    BatchKeyedStore.write(Seq(3L).toDF("k"), dir, 2L)
    BatchKeyedStore.compact(spark, dir, schema, upTo = 1L)
    assert(dirNames(dir) == Set("base-00001", "batch-00002"))
    // the replay of batch 2: its probe must see exactly batches 0..1
    // (now the base), never its own first attempt's rows
    val probe = BatchKeyedStore.readBefore(spark, dir, 2L, schema)
    assert(probe.get.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    BatchKeyedStore.write(Seq(3L).toDF("k"), dir, 2L) // identical recompute
    assert(BatchKeyedStore.read(spark, dir, schema)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "replay across compaction must neither duplicate nor lose rows")
  }

  test("a half-written base (no _SUCCESS) is invisible to every view") {
    import spark.implicits._
    val dir = tmpDir("bks5") + "/store"
    BatchKeyedStore.write(Seq(1L).toDF("k"), dir, 0L)
    // simulate a compaction that crashed mid-write: a base directory with
    // data but whose job-level _SUCCESS marker never landed
    Seq(99L).toDF("k").write.mode("overwrite").parquet(s"$dir/base-00007")
    val marker = new java.io.File(s"$dir/base-00007/_SUCCESS")
    assert(marker.exists() && marker.delete())
    assert(BatchKeyedStore.read(spark, dir, schema)
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "an unfinished base must stay invisible")
    assert(BatchKeyedStore.readBefore(spark, dir, 9L, schema).get
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("readCommitted hides a written-but-uncommitted batch until its replay commits") {
    import spark.implicits._
    val dir = tmpDir("bks6") + "/store"
    val ckpt = tmpDir("bks6-ckpt")
    def commit(i: Long): Unit = {
      val c = java.nio.file.Paths.get(ckpt, "commits")
      java.nio.file.Files.createDirectories(c)
      java.nio.file.Files.write(c.resolve(i.toString), "v1".getBytes("UTF-8"))
      ()
    }
    // no commits yet: nothing is visible even though batch 0 is on disk
    BatchKeyedStore.write(Seq(1L).toDF("k"), dir, 0L)
    assert(BatchKeyedStore.readCommitted(spark, dir, schema, ckpt).count() == 0L)
    commit(0L)
    assert(BatchKeyedStore.readCommitted(spark, dir, schema, ckpt)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // batch 1 written, commit pending (the crashed-attempt window): the
    // committed view excludes it, the at-least-once view includes it
    BatchKeyedStore.write(Seq(2L).toDF("k"), dir, 1L)
    assert(BatchKeyedStore.readCommitted(spark, dir, schema, ckpt).count() == 1L)
    assert(BatchKeyedStore.read(spark, dir, schema).count() == 2L)
    commit(1L)
    assert(BatchKeyedStore.readCommitted(spark, dir, schema, ckpt).count() == 2L)
  }
}
