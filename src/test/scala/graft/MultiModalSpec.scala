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

  test("resizeTo: binary->binary, fixed output size, target dims recorded, deterministic") {
    val df = Seq(
      (1L, Array.fill[Byte](10000)(7)), // large source
      (2L, Array[Byte](1, 2, 3)),       // tiny source
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "payload")
    val got = MultiModal.resizeTo(df, "doc_id", "payload", 128, 96)
      .collect().sortBy(_.doc_id)
    // thumbnails don't grow with originals: all outputs the same size
    assert(got.map(_.payload.length).distinct.toSeq == Seq(8 + 32))
    assert(got.forall(r => r.width == 128 && r.height == 96))
    val again = MultiModal.resizeTo(df, "doc_id", "payload", 128, 96)
      .collect().sortBy(_.doc_id)
    got.zip(again).foreach { case (a, b) =>
      assert(a.payload.toSeq == b.payload.toSeq)
    }
    // different sources -> different payloads (content-derived)
    assert(got(0).payload.toSeq != got(1).payload.toSeq)
  }

  test("extractFeatures: unit-norm vectors feed the ANN cosine path directly") {
    import graft.functions.VectorFunctions.cosineSim
    val df = Seq(
      (1L, "payload one".getBytes("UTF-8")),
      (2L, "payload two".getBytes("UTF-8")),
      (3L, "payload one".getBytes("UTF-8")) // same content as 1
    ).toDF("doc_id", "payload")
    val feats = MultiModal.extractFeatures(df, "doc_id", "payload").cache()
    val rows = feats.collect().sortBy(_.doc_id)
    assert(rows.forall(_.features.length == 64))
    rows.foreach { r =>
      val n = math.sqrt(r.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not unit-norm: $n")
    }
    // identical payloads -> identical features; distinct -> distinct
    assert(rows(0).features.toSeq == rows(2).features.toSeq)
    assert(rows(0).features.toSeq != rows(1).features.toSeq)
    // and the output plugs into the D-family operators unchanged
    val sims = feats.toDF().as("a")
      .crossJoin(feats.toDF().as("b"))
      .select(cosineSim(col("a.features"), col("b.features")).as("sim"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("sampleFrames: every-k explode shape; zero-frame items emit no rows") {
    val meta = Seq((1L, 10), (2L, 1), (3L, 0)).toDF("doc_id", "n_frames")
    val got = MultiModal.sampleFrames(meta, "doc_id", "n_frames", everyK = 4)
      .as[(Long, Int)].collect().toSet
    // doc 3 has no frames: no phantom frame 0 for it
    assert(got == Set((1L, 0), (1L, 4), (1L, 8), (2L, 0)))
    intercept[IllegalArgumentException] {
      MultiModal.sampleFrames(meta, "doc_id", "n_frames", everyK = 0)
    }
  }
}
