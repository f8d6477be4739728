package graft

import graft.streaming.StreamingSpanScreen

/** The exact-substring dedup family's streaming rung: store-known maximal
  * token ranges are excised from each landing micro-batch before the
  * novel remainder (docs AND its grams) appends to the store — the
  * dedup_substring_incremental semantics, driven through foreachBatch
  * with the SHARED SpanOps island rule. */
class StreamingSpanScreenSpec extends SparkSpec {

  private def doc(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text"}"""

  private def land(dir: String, file: String, docs: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, file),
      docs.mkString("\n").getBytes("UTF-8"))

  test("store-known spans are excised across drains; novel text and its grams accumulate") {
    val landing = tmpDir("span-landing")
    val docs = tmpDir("span-store") + "/docs"
    val grams = tmpDir("span-store") + "/grams"
    val ckpt = tmpDir("span-ckpt")

    val known = (1 to 15).map(i => s"kn$i").mkString(" ")  // 15 tokens
    val fresh = (1 to 12).map(i => s"fr$i").mkString(" ")  // 12 tokens
    val tiny = "under eight tokens here"                   // 4 tokens < Tk

    // drain 1: an empty store — everything passes through verbatim
    land(landing, "b1.json", Seq(doc(1L, known), doc(2L, tiny)))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    val afterOne = StreamingSpanScreen.readDocStore(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("removed_tok"),
        r.getAs[String]("clean_text"))).sortBy(_._1)
    assert(afterOne.toSeq == Seq((1L, 0L, known), (2L, 0L, tiny)),
      s"empty store must pass everything verbatim, got ${afterOne.toSeq}")
    // gram store: doc 1's 8 grams (15 - 8 + 1); the tiny doc emits none
    assert(StreamingSpanScreen.readGramStore(spark, grams).count() == 8L)

    // drain 2: doc 3 = known run + fresh tail — the known 15 tokens are
    // store-covered and excised; only the fresh tail is stored
    land(landing, "b2.json", Seq(doc(3L, s"$known $fresh")))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    val d3 = StreamingSpanScreen.readDocStore(spark, docs).filter("doc_id = 3").collect()(0)
    assert(d3.getAs[Long]("n_tok") == 27L)
    assert(d3.getAs[Long]("removed_tok") == 15L)
    assert(d3.getAs[String]("clean_text") == fresh,
      s"known run must be excised exactly, got '${d3.getAs[String]("clean_text")}'")
    // gram store gained the CLEANED text's grams: fresh has 12 - 8 + 1 = 5
    assert(StreamingSpanScreen.readGramStore(spark, grams).count() == 13L)

    // drain 3: doc 4 re-lands doc 3's ORIGINAL text. Flagged extents:
    // the known run (grams @0..7 -> extent [0,15)) and the stored fresh
    // tail (grams @15..19 -> extent [15,27)); the boundary-straddling
    // grams @8..14 were never stored, but the island rule bridges the
    // flagged-position gap 15 - 7 = 8 <= Tk, so the TRUE union [0,27)
    // comes out as one span and the copy excises FULLY. Doc 5 re-lands
    // the tiny doc: shorter than Tk, no gram exists, passes verbatim.
    land(landing, "b3.json", Seq(doc(4L, s"$known $fresh"), doc(5L, tiny)))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    val afterThree = StreamingSpanScreen.readDocStore(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("removed_tok"),
        r.getAs[String]("clean_text"))).sortBy(_._1).toSeq
    assert(afterThree(3) == ((4L, 27L, "")),
      s"a full re-land must excise completely, got ${afterThree(3)}")
    assert(afterThree(4) == ((5L, 0L, tiny)))
    // a fully-excised doc contributes no grams; the verbatim tiny doc none
    assert(StreamingSpanScreen.readGramStore(spark, grams).count() == 13L)
    // the gram store stays distinct (the anti-join before every append)
    assert(StreamingSpanScreen.readGramStore(spark, grams).distinct().count() == 13L)
  }

  test("compaction between drains: the base carries the gram store, excision semantics unchanged") {
    val landing = tmpDir("span-cmp-landing")
    val docs = tmpDir("span-cmp-store") + "/docs"
    val grams = tmpDir("span-cmp-store") + "/grams"
    val ckpt = tmpDir("span-cmp-ckpt")
    val known = (1 to 15).map(i => s"kn$i").mkString(" ")

    land(landing, "b1.json", Seq(doc(1L, known)))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    StreamingSpanScreen.compactStores(spark, docs, grams, ckpt)
    def names(d: String) = new java.io.File(d).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(names(grams).forall(_.startsWith("base-")) &&
      names(docs).forall(_.startsWith("base-")),
      s"committed batches must fold into a base, got ${names(grams)}")
    assert(StreamingSpanScreen.readGramStore(spark, grams).count() == 8L,
      "compaction must preserve the gram store's content")

    // a later drain probes THROUGH the base: the re-landed known run is
    // store-covered and excises fully
    land(landing, "b2.json", Seq(doc(2L, known)))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    val d2 = StreamingSpanScreen.readDocStore(spark, docs)
      .filter("doc_id = 2").collect()(0)
    assert(d2.getAs[Long]("removed_tok") == 15L,
      s"base-backed probe must excise the known run, got $d2")
    assert(StreamingSpanScreen.readGramStore(spark, grams).count() == 8L,
      "a fully-excised copy contributes no new grams")
  }

  test("within-batch duplication is NOT flagged (the incremental contract); both copies store") {
    val landing = tmpDir("span2-landing")
    val docs = tmpDir("span2-store") + "/docs"
    val grams = tmpDir("span2-store") + "/grams"
    val ckpt = tmpDir("span2-ckpt")
    val text = (1 to 10).map(i => s"nn$i").mkString(" ")
    land(landing, "b1.json", Seq(doc(10L, text), doc(11L, text)))
    StreamingSpanScreen.drain(spark, landing, docs, grams, ckpt)
    val got = StreamingSpanScreen.readDocStore(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text")))
      .sortBy(_._1).toSeq
    // new-new pairs belong to the periodic full batch re-run, exactly
    // like dedup_substring_incremental's odd/odd contract
    assert(got == Seq((10L, text), (11L, text)))
  }
}
