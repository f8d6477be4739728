package graft

import graft.streaming.StreamingUrlScreen

/** The URL family's streaming rung: each landing micro-batch is
  * canonicalized, keep-best-deduped within the batch, and anti-joined
  * against the persisted canonical-URL store (first stored wins across
  * batches — the crawl-frontier contract). */
class StreamingUrlScreenSpec extends SparkSpec {

  private def page(id: Long, url: String, n: Long): String =
    s"""{"doc_id": $id, "url": "$url", "n_chars": $n}"""

  private def land(dir: String, file: String, rows: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, file),
      rows.mkString("\n").getBytes("UTF-8"))

  test("within-batch keep-best, cross-batch first-wins, canon variants collapse") {
    val landing = tmpDir("url-landing")
    val docs = tmpDir("url-store") + "/docs"
    val urls = tmpDir("url-store") + "/urls"
    val ckpt = tmpDir("url-ckpt")

    // drain 1: three raw variants of ONE canonical page (+ a distinct
    // page) — within-batch keep-best must leave the largest copy
    land(landing, "b1.json", Seq(
      page(1L, "http://www.Ex.org:80/a/?utm_s=1&x=1#f", 100L),
      page(2L, "HTTP://ex.org/a?x=1", 300L),
      page(3L, "http://EX.ORG/a/?x=1&utm_m=2", 200L),
      page(4L, "https://other.net/b", 50L)))
    StreamingUrlScreen.drain(spark, landing, docs, urls, ckpt)
    val afterOne = spark.read.parquet(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("canon_url"),
        r.getAs[Long]("n_chars"))).sortBy(_._1)
    assert(afterOne.toSeq == Seq(
      (2L, "http://ex.org/a?x=1", 300L),
      (4L, "https://other.net/b", 50L)),
      s"got ${afterOne.toSeq}")
    assert(spark.read.parquet(urls).count() == 2L)

    // drain 2: a LARGER copy of the stored page arrives — the frontier
    // never re-admits a known canon key (first stored wins); a genuinely
    // new page passes
    land(landing, "b2.json", Seq(
      page(5L, "http://ex.org/a?x=1", 900L),
      page(6L, "https://new.com/c", 70L)))
    StreamingUrlScreen.drain(spark, landing, docs, urls, ckpt)
    val afterTwo = spark.read.parquet(docs).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(afterTwo == Seq(2L, 4L, 6L), s"got $afterTwo")
    assert(spark.read.parquet(urls).count() == 3L)

    // the doc store's canon keys stay distinct across both drains
    val keys = spark.read.parquet(docs).select("canon_url").collect()
      .map(_.getString(0)).toSeq
    assert(keys.distinct.size == keys.size)

    // a long-lived stream must not leak per-batch cache entries
    assert(spark.sharedState.cacheManager.isEmpty,
      "streaming drain left persisted blocks behind")
  }
}
