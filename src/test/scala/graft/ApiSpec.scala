package graft

import graft.api.EmailEtlApi

/** End-to-end through the public facade: import → embed → search → ask →
  * categorize → status, driving the same path the CLI verbs use. */
class ApiSpec extends SparkSpec {

  private def rawMsg(id: String, subject: String, dateRfc: String, body: String): String =
    s"""{"id":"$id","threadId":"t-$id","labelIds":["INBOX"],"snippet":"s","sizeEstimate":1,"historyId":"h",
       |"payload":{"partId":"0","mimeType":"text/plain","filename":"",
       |"headers":[{"name":"From","value":"sender@x.com"},{"name":"Subject","value":"$subject"},{"name":"Date","value":"$dateRfc"}],
       |"body":{"data":"${b64url(body)}","size":1,"attachmentId":null}}}""".stripMargin.replaceAll("\n", "")

  private lazy val store = tmpDir("api-store")
  private lazy val api = {
    val inbox = tmpDir("api-inbox")
    java.nio.file.Files.write(java.nio.file.Paths.get(inbox, "batch.json"),
      Seq(
        rawMsg("x1", "spark join tuning", "Mon, 15 Jan 2024 10:00:00 +0000",
          "how to tune spark joins with broadcast"),
        rawMsg("x2", "project deadline", "Tue, 16 Jan 2024 10:00:00 +0000",
          "please send the report before the meeting"),
        rawMsg("x3", "pizza tonight", "Wed, 17 Jan 2024 10:00:00 +0000",
          "dinner at eight with friends")
      ).mkString("\n").getBytes("UTF-8"))
    val a = new EmailEtlApi(spark, store)
    val stats = a.importFull(inbox)
    assert(stats("processed") == 3L && stats("embedded") == 3L)
    a
  }

  test("import full: store written, embeddings backfilled, idempotent counts") {
    assert(api.emails.count() == 3)
    assert(api.emails.filter("embedding IS NULL").count() == 0)
    assert(api.estimateCost() == 0.0) // backlog drained
  }

  test("search semantic returns ranked hits through hybrid scorer") {
    val hits = api.searchSemantic("spark join tuning", 3).collect()
    assert(hits.nonEmpty)
    assert(hits(0).getAs[String]("message_id") == "x1")
  }

  test("ask: retrieval + stub answer with sources") {
    val (answer, sources) = api.ask("what about spark joins?", contextLimit = 2)
    assert(answer.contains("[stub]"))
    assert(sources.length == 2)
  }

  test("extract actions: injectable now makes the last-N-days window deterministic") {
    val acts = api.extractActions(days = 30, limit = 10,
      now = Some(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))).collect()
    // all 3 fixture emails fall in the injected window; only the
    // "please send the report" one carries an action pattern
    assert(acts.length == 1)
    assert(acts(0).getAs[String]("subject") == "project deadline")
    assert(api.extractActions(days = 1, limit = 10,
      now = Some(java.sql.Timestamp.valueOf("2025-06-01 00:00:00"))).collect().isEmpty)
  }

  test("categorize + patterns + status verbs") {
    val cats = api.categorize(10).collect()
    assert(cats.length == 3)
    assert(api.patterns("domain", days = 36500).collect()
      .exists(_.getAs[String]("key") == "x.com"))
    val st = api.status().collect()(0)
    assert(st.getAs[Long]("total_emails") == 3L)
  }

  test("unknown CLI verb prints usage without throwing") {
    graft.api.Cli.run(spark, List("bogus"))
  }
}
