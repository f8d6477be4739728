package graft

import graft.ingest.Normalize
import graft.operators.Upsert

/** Adversarial ingest: the normalizer must produce canonical rows (or
  * clean nulls) for every message the raw schema can express — truncated
  * JSON, missing subtrees, garbage base64, hostile header values — and
  * the A4 merge must stay idempotent over the mess. */
class IngestFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private def randJsonString(n: Int): String = {
    val chars = "abc XYZ{}[]\\\"<>@.,:;!?0129é漢-_"
    val raw = (0 until n).map(_ => chars(rnd.nextInt(chars.length))).mkString
    raw.replace("\\", "\\\\").replace("\"", "\\\"")
  }

  private def fuzzMsg(i: Int): String = {
    val id = s"fz$i"
    val maybe = (p: Double) => rnd.nextDouble() < p
    val headers = scala.collection.mutable.ArrayBuffer.empty[String]
    if (maybe(0.8)) headers += s"""{"name":"From","value":"${randJsonString(12)}"}"""
    if (maybe(0.6)) headers += s"""{"name":"To","value":"${randJsonString(20)}"}"""
    if (maybe(0.7)) headers += s"""{"name":"Subject","value":"${randJsonString(25)}"}"""
    if (maybe(0.7)) headers += s"""{"name":"Date","value":"${
      if (maybe(0.5)) "Mon, 15 Jan 2024 10:30:00 +0000" else randJsonString(15)}"}"""
    val body =
      if (maybe(0.3)) """{"data":null,"size":0,"attachmentId":null}"""
      else if (maybe(0.5)) s"""{"data":"${b64url(randJsonString(30))}","size":1,"attachmentId":null}"""
      else s"""{"data":"!!${randJsonString(10)}","size":1,"attachmentId":null}""" // invalid b64
    val parts =
      if (maybe(0.4)) ""
      else s""","parts":[{"partId":"p","mimeType":"${
        if (maybe(0.5)) "text/plain" else randJsonString(8)}","filename":"${
        if (maybe(0.3)) randJsonString(10) + ".exe" else ""}","headers":[],"body":$body}]"""
    s"""{"id":"$id","threadId":${if (maybe(0.8)) s""""t$i"""" else "null"},
       |"labelIds":${if (maybe(0.7)) """["INBOX"]""" else "null"},
       |"snippet":null,"sizeEstimate":${if (maybe(0.5)) "123" else "null"},"historyId":null,
       |"payload":{"partId":"0","mimeType":"${
         if (maybe(0.7)) "multipart/mixed" else "text/plain"}","filename":"",
       |"headers":[${headers.mkString(",")}],"body":$body$parts}}""".stripMargin
      .replaceAll("\n", "")
  }

  test("200 fuzzed messages normalize without exceptions; invariants hold") {
    val dir = tmpDir("fuzz")
    val lines = (1 to 200).map(fuzzMsg) :+ "{not valid json at all" :+ ""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "fuzz.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = Normalize.readRaw(spark, dir)
    val emails = Normalize.emails(raw).cache()
    val attachments = Normalize.attachments(raw)

    val n = emails.count()
    assert(n == 200, s"expected 200 valid rows, got $n (corrupt line must drop, not throw)")
    assert(emails.filter("message_id IS NULL").count() == 0)
    assert(emails.filter("id IS NULL").count() == 0)
    // booleans/arrays materialize, never throw
    assert(emails.select("has_attachments", "recipients", "labels").count() == 200)
    // attachment rows all reference existing emails
    val orphan = attachments.join(emails,
      attachments("email_id") === emails("id"), "left_anti").count()
    assert(orphan == 0)

    // A4 merge of the corpus onto itself is a fixpoint
    val merged = Upsert.mergeByKey(emails, emails, "message_id", "updated_at")
    assert(merged.count() == n)
  }

  test("random-depth MIME trees (0-7 levels): body found at whatever depth it hides") {
    val noBody = """{"data":null,"size":0,"attachmentId":null}"""
    def leafBody(tag: String) =
      s"""{"data":"${b64url(tag)}","size":1,"attachmentId":null}"""
    // one text/plain leaf at exactly `depth`; multipart wrappers above it,
    // plus decoy empty-body parts at every level
    def nest(depth: Int, tag: String): String = {
      val leaf = s"""{"partId":"L","mimeType":"text/plain","filename":"","headers":[],"body":${leafBody(tag)}}"""
      (1 to depth).foldLeft(leaf) { (inner, lvl) =>
        s"""{"partId":"w$lvl","mimeType":"multipart/mixed","filename":"","headers":[],"body":$noBody,
           |"parts":[{"partId":"d$lvl","mimeType":"text/html","filename":"","headers":[],"body":$noBody},$inner]}"""
          .stripMargin.replaceAll("\n", "")
      }
    }
    val dir = tmpDir("fuzz-depth")
    val msgs = (0 to 7).map { d =>
      s"""{"id":"dep$d","threadId":"t","labelIds":[],"snippet":null,"sizeEstimate":null,"historyId":null,
         |"payload":{"partId":"0","mimeType":"multipart/mixed","filename":"",
         |"headers":[{"name":"From","value":"x@y.z"}],"body":$noBody,
         |"parts":[${nest(d, s"body at $d")}]}}""".stripMargin.replaceAll("\n", "")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "deep.json"),
      msgs.mkString("\n").getBytes("UTF-8"))
    val rows = Normalize.emails(Normalize.readRaw(spark, dir))
      .select("message_id", "body_plain").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (0 to 6).foreach { d =>
      assert(rows(s"dep$d") == s"body at $d", s"depth $d body lost")
    }
    // depth 7 leaf sits at nesting level 8 (payload + wrapper + 7) — one
    // past the declared bound: dropped cleanly, not fatal
    assert(rows.contains("dep7"))
  }
}
