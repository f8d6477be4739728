package graft

import graft.streaming.StreamingPacker
import graft.streaming.StreamingPacker.Doc
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StreamingPackerSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("shard", LongType), StructField("doc_id", LongType),
    StructField("n_tok", LongType)))

  private def run(landing: String, name: String, capacity: Long,
      maxOpen: Int): Map[Long, Long] = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(landing).as[Doc]
    val q = StreamingPacker.pack(stream, capacity, maxOpen)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation", tmpDir(s"$name-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).select($"doc_id", $"bin_id")
      .as[(Long, Long)].collect().toMap
  }

  private def file(landing: String, name: String, docs: (Long, Long)*): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
      docs.map { case (id, n) =>
        s"""{"shard":0,"doc_id":$id,"n_tok":$n}"""
      }.mkString("\n").getBytes("UTF-8"))

  test("open bins persist across micro-batches; oversize closes as a singleton") {
    val landing = tmpDir("pack-landing")
    // batch 1: 200 opens bin 1; 300 is oversize (bin 2, closes at once);
    // 40 first-fits bin 1 (240). batch 2: 10 lands in BATCH 1's bin 1
    // (250) — the cross-batch continuation; 250 no longer fits -> bin 3
    file(landing, "b1.json", 1L -> 200L, 2L -> 300L, 3L -> 40L)
    file(landing, "b2.json", 10L -> 10L, 11L -> 250L)
    val got = run(landing, "pack_out", capacity = 256L, maxOpen = 4)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 10L -> 1L, 11L -> 3L),
      got.toString)
  }

  test("bounded open set evicts the fullest bin; exactly-full bins close") {
    val landing = tmpDir("pack-landing2")
    // cap 100, maxOpen 2: 90 -> bin1; 80 -> bin2; 50 -> bin3 and bin1
    // (fullest) is evicted; 10 would fit bin1 were it open -> lands in
    // bin2 (90); next 10 fills bin2 to exactly 100 -> closes; last 10 ->
    // bin3. Every bin total respects capacity forever.
    file(landing, "b1.json", 1L -> 90L, 2L -> 80L, 3L -> 50L,
      4L -> 10L, 5L -> 10L, 6L -> 10L)
    val got = run(landing, "pack_out2", capacity = 100L, maxOpen = 2)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L,
      6L -> 3L), got.toString)
    // capacity invariant over the emitted assignments
    val loads = Map(1L -> 90L, 2L -> 100L, 3L -> 60L)
    val w = Map(1L -> 90L, 2L -> 80L, 3L -> 50L, 4L -> 10L,
      5L -> 10L, 6L -> 10L)
    got.groupBy(_._2).foreach { case (bid, ds) =>
      assert(ds.keys.toSeq.map(w).sum == loads(bid))
    }
  }
}
