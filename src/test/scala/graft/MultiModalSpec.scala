package graft

import graft.operators.MultiModal
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta: typed metadata per payload, deterministic, format sniffed") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val df = Seq((1L, jpeg), (2L, png), (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = MultiModal.decodeMeta(df, "doc_id", "payload")
      .collect().sortBy(_.doc_id)
    assert(got.map(_.format).toSeq == Seq("jpeg", "png", "bin"))
    assert(got.forall(m => m.width >= 64 && m.height >= 64))
    assert(got(0).n_bytes == 7L)
    val again = MultiModal.decodeMeta(df, "doc_id", "payload")
      .collect().sortBy(_.doc_id)
    assert(got.toSeq == again.toSeq)
  }

  test("sampleFrames: every-k explode shape") {
    val meta = Seq((1L, 10), (2L, 1), (3L, 0)).toDF("doc_id", "n_frames")
    val got = MultiModal.sampleFrames(meta, "doc_id", "n_frames", everyK = 4)
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 0), (1L, 4), (1L, 8), (2L, 0), (3L, 0)))
  }
}
