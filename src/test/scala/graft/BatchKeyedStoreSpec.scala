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
}
