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

  /** Brute-force reference of the pHash16 geometry, straight from the
    * documented rule: 20 cell sums over 80 evenly spaced probes, 16
    * horizontal-gradient sign bits. */
  private def refPhash(b: Array[Byte]): Long = {
    val nm1 = b.length - 1
    val cells = (0 until MultiModal.PHashCells).map { k =>
      (0 until MultiModal.PHashProbes).map { j =>
        val g = k * MultiModal.PHashProbes + j
        b(((g.toLong * nm1) / (MultiModal.PHashPoints - 1)).toInt) & 0xff
      }.sum.toLong
    }
    (for { r <- 0 until MultiModal.PHashRows; c <- 0 until MultiModal.PHashCols - 1 }
      yield
        if (cells(r * MultiModal.PHashCols + c) < cells(r * MultiModal.PHashCols + c + 1))
          1L << (r * (MultiModal.PHashCols - 1) + c)
        else 0L).sum
  }

  test("pHash16: SQL expression matches the brute-force geometry reference") {
    val payloads = Seq[(Long, Array[Byte])](
      (1L, (0 until 5000).map(i => ((i * 7 + 13) % 251).toByte).toArray),
      (2L, { val r = new java.util.Random(42); val a = new Array[Byte](777); r.nextBytes(a); a }),
      (3L, Array[Byte](99)), // single byte: every cell equal -> hash 0
      (4L, "plain text payload surrogate".getBytes("UTF-8")))
    val got = MultiModal.pHash16(payloads.toDF("doc_id", "payload"), "doc_id", "payload")
      .as[(Long, Long)].collect().toMap
    payloads.foreach { case (id, b) =>
      assert(got(id) == refPhash(b), s"doc $id: ${got(id)} != ref ${refPhash(b)}")
      // interpreted eval path (constant folding etc.) == codegen path
      assert(graft.functions.PHashCompute.compute(b) == refPhash(b), s"eval path, doc $id")
    }
    assert(got(3L) == 0L)
    // empty payloads have no pixel surface: excluded, not hashed to 0
    val withEmpty = MultiModal.pHash16(
      Seq((9L, Array.empty[Byte])).toDF("doc_id", "payload"), "doc_id", "payload")
    assert(withEmpty.count() == 0L)
  }

  test("pHash16: a lightly edited payload the byte-hash misses stays within banding reach") {
    // A: smooth deterministic byte surface; B: five scattered single-byte
    // edits (a re-encode artifact); C: unrelated content.
    val a = (0 until 10000).map(i => ((i / 64) % 256).toByte).toArray
    val b = a.clone()
    Seq(123, 2500, 5000, 7777, 9999).foreach(i => b(i) = (b(i) + 1).toByte)
    val c = { val r = new java.util.Random(7); val x = new Array[Byte](10000); r.nextBytes(x); x }
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "payload")
    // exact dedup misses the pair: checksums differ
    val sums = df.select($"doc_id", sha2($"payload", 256).as("s"))
      .as[(Long, String)].collect().toMap
    assert(sums(1L) != sums(2L), "edited payload must evade the byte hash")
    val ph = MultiModal.pHash16(df, "doc_id", "payload")
      .as[(Long, Long)].collect().toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // perceptual hash holds: within the Hamming <= 3 banding guarantee,
    // so the 4x4-bit block join MUST surface the pair (pigeonhole)
    assert(hamming(ph(1L), ph(2L)) <= 3,
      s"edited pair drifted: ${ph(1L)} vs ${ph(2L)}")
    assert((0 until 4).exists(band =>
      ((ph(1L) >> (band * 4)) & 15) == ((ph(2L) >> (band * 4)) & 15)))
    // the unrelated payload reads far: outside banding reach of A
    assert(hamming(ph(1L), ph(3L)) > 3,
      s"unrelated payload too close: ${ph(1L)} vs ${ph(3L)}")
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
