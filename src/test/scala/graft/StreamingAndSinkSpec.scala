package graft

import graft.ingest.Normalize
import graft.sinks.MarkdownSink
import graft.streaming.IncrementalSync
import org.apache.spark.sql.functions._

class StreamingAndSinkSpec extends SparkSpec {
  import spark.implicits._

  private def rawMsg(id: String, subject: String, dateRfc: String, body: String): String =
    s"""{"id":"$id","threadId":"t-$id","labelIds":["INBOX"],"snippet":"s","sizeEstimate":1,"historyId":"h",
       |"payload":{"partId":"0","mimeType":"text/plain","filename":"",
       |"headers":[{"name":"From","value":"a@x.com"},{"name":"Subject","value":"$subject"},{"name":"Date","value":"$dateRfc"}],
       |"body":{"data":"${b64url(body)}","size":1,"attachmentId":null}}}""".stripMargin.replaceAll("\n", "")

  test("G1 streamSync: AvailableNow drains inbox, dedups, idempotent re-run") {
    val inbox = tmpDir("inbox")
    val store = tmpDir("store") + "/emails"
    val ckpt = tmpDir("ckpt")
    java.nio.file.Files.write(java.nio.file.Paths.get(inbox, "b1.json"),
      Seq(
        rawMsg("s1", "first", "Mon, 15 Jan 2024 10:00:00 +0000", "one"),
        rawMsg("s2", "second", "Mon, 15 Jan 2024 11:00:00 +0000", "two"),
        rawMsg("s2", "second dup", "Mon, 15 Jan 2024 11:00:00 +0000", "two dup")
      ).mkString("\n").getBytes("UTF-8"))

    IncrementalSync.streamSync(spark, inbox, store, ckpt)
    val stored = spark.read.parquet(store)
    assert(stored.count() == 2)

    // new file lands; re-run drains only the delta and upserts
    java.nio.file.Files.write(java.nio.file.Paths.get(inbox, "b2.json"),
      Seq(
        rawMsg("s2", "second updated", "Tue, 16 Jan 2024 09:00:00 +0000", "two v2"),
        rawMsg("s3", "third", "Tue, 16 Jan 2024 10:00:00 +0000", "three")
      ).mkString("\n").getBytes("UTF-8"))
    IncrementalSync.streamSync(spark, inbox, store, ckpt)
    val after = spark.read.parquet(store)
    assert(after.count() == 3)
    assert(after.filter($"message_id" === "s2").collect()(0)
      .getAs[String]("subject") == "second updated")
  }

  test("G1 streamSync crash recovery: store deleted but staging intact -> staging promoted, no data loss") {
    val inbox = tmpDir("cr-inbox")
    val store = tmpDir("cr-store") + "/emails"
    val ckpt = tmpDir("cr-ckpt")
    java.nio.file.Files.write(java.nio.file.Paths.get(inbox, "b1.json"),
      Seq(rawMsg("c1", "one", "Mon, 15 Jan 2024 10:00:00 +0000", "x"),
        rawMsg("c2", "two", "Mon, 15 Jan 2024 11:00:00 +0000", "y"))
        .mkString("\n").getBytes("UTF-8"))
    IncrementalSync.streamSync(spark, inbox, store, ckpt)
    assert(spark.read.parquet(store).count() == 2)

    // simulate a crash between delete(store) and rename(staging, store):
    // staging holds the complete merged result, the store is gone
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + "__staging"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store)))

    // next drain (new file) must first promote staging, then merge — the
    // pre-crash emails survive
    java.nio.file.Files.write(java.nio.file.Paths.get(inbox, "b2.json"),
      Seq(rawMsg("c3", "three", "Tue, 16 Jan 2024 10:00:00 +0000", "z"))
        .mkString("\n").getBytes("UTF-8"))
    IncrementalSync.streamSync(spark, inbox, store, ckpt)
    val after = spark.read.parquet(store)
    assert(after.count() == 3)
    assert(after.select("message_id").as[String].collect().sorted.toSeq ==
      Seq("c1", "c2", "c3"))
  }

  test("G1 batchSync: null-date messages pass the cursor instead of being dropped forever") {
    val existing = Normalize.emails(
      rawDf(Seq(rawMsg("e1", "old", "Mon, 15 Jan 2024 10:00:00 +0000", "x"))))
    // a message whose Date header fails RFC-2822 parsing -> date null
    val raw = rawDf(Seq(
      rawMsg("e2", "undated", "not a real date", "y"),
      rawMsg("e3", "new", "Tue, 16 Jan 2024 10:00:00 +0000", "z")))
    val merged = IncrementalSync.batchSync(existing, raw)
    assert(merged.count() == 3)
    assert(merged.filter($"message_id" === "e2").count() == 1)
  }

  test("G1 batchSync: cursor + overlap + merge") {
    val existing = Normalize.emails(
      rawDf(Seq(rawMsg("e1", "old", "Mon, 01 Jan 2024 10:00:00 +0000", "x"))))
    val raw = rawDf(Seq(
      rawMsg("e1", "old", "Mon, 01 Jan 2024 10:00:00 +0000", "x"),
      rawMsg("e2", "new", "Mon, 15 Jan 2024 10:00:00 +0000", "y")))
    val merged = IncrementalSync.batchSync(existing, raw)
    assert(merged.count() == 2)
  }

  private def rawDf(lines: Seq[String]) = {
    val dir = tmpDir("raw")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "m.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    Normalize.readRaw(spark, dir)
  }

  test("A5/A6 markdown archive: partitioned write, index, point read") {
    val out = tmpDir("mdsink")
    val emails = Normalize.emails(rawDf(Seq(
      rawMsg("a1", "Subject One", "Mon, 15 Jan 2024 10:00:00 +0000", "body one"),
      rawMsg("a2", "Subject Two", "Sat, 17 Feb 2024 11:00:00 +0000", "body two"))))
    val index = MarkdownSink.writeArchive(emails, out)
    assert(index.count() == 2)
    // YYYY/MM partition dirs exist
    assert(new java.io.File(s"$out/archive/year=2024/month=1").exists())
    assert(new java.io.File(s"$out/archive/year=2024/month=2").exists())

    val loaded = MarkdownSink.loadEmail(spark, out, "a1").collect()(0)
    assert(loaded.getAs[String]("frontmatter").contains("subject: \"Subject One\""))
    assert(loaded.getAs[String]("content").contains("body one"))
    assert(loaded.getAs[String]("path").startsWith("2024/01/20240115_100000_subject-one"))

    val stats = MarkdownSink.storageStats(index).collect()(0)
    assert(stats.getAs[Long]("total_emails") == 2L)
  }

  test("B8 date-range scan over index") {
    val out = tmpDir("mdsink2")
    val emails = Normalize.emails(rawDf(Seq(
      rawMsg("r1", "S1", "Mon, 15 Jan 2024 10:00:00 +0000", "b"),
      rawMsg("r2", "S2", "Sat, 17 Feb 2024 11:00:00 +0000", "b"))))
    val index = MarkdownSink.writeArchive(emails, out)
    val got = MarkdownSink.listByDateRange(index,
      "2024-01-01 00:00:00", "2024-01-31 00:00:00")
      .select("message_id").as[String].collect()
    assert(got.toSeq == Seq("r1"))
  }
}
