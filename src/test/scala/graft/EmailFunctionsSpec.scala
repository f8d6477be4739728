package graft

import graft.functions.EmailFunctions._
import org.apache.spark.sql.functions._

class EmailFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("PII scrub: emails, URLs, long numbers replaced with typed placeholders") {
    import graft.functions.EmailFunctions.scrubPii
    val in = Seq(
      "contact alice.smith+x@corp.example.com or see https://example.com/a?b=1 now",
      "call (555) 123-4567 or 555.987.6543 x99",
      "clean text with the number 42 and v2.0 kept",
      null
    ).toDF("t")
    val rows = in.select(scrubPii(col("t")).as("s"))
      .select("s.text", "s.n_emails", "s.n_urls", "s.n_numbers")
      .collect()
    assert(rows(0).getString(0) == "contact <EMAIL> or see <URL> now")
    assert(rows(0).getLong(1) == 1 && rows(0).getLong(2) == 1)
    assert(rows(1).getString(0) == "call <NUMBER> or <NUMBER> x99")
    assert(rows(1).getLong(3) == 2)
    // short numbers and versions survive; null -> empty, all zero
    assert(rows(2).getString(0) == "clean text with the number 42 and v2.0 kept")
    assert(rows(2).getLong(1) == 0 && rows(2).getLong(2) == 0 && rows(2).getLong(3) == 0)
    assert(rows(3).getString(0) == "" && rows(3).getLong(1) == 0)
    // idempotent: scrubbing scrubbed text changes nothing
    val twice = in.select(scrubPii(col("t")).getField("text").as("t1"))
      .select(scrubPii(col("t1")).getField("text").as("t2"), col("t1"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("F11 slug: charset, collapse, truncate, default") {
    val rows = Seq(
      "Hello World!", "  --  ", "", "A" * 100, "Re: [urgent] fix/bug #42"
    ).toDF("t").select(slug(col("t"))).as[String].collect()
    assert(rows(0) == "hello-world")
    assert(rows(1) == "untitled")
    assert(rows(2) == "untitled")
    assert(rows(3) == "a" * 50)
    assert(rows(4) == "re-urgent-fix-bug-42")
  }

  test("F6 address parse: Name <addr>, bare addr, quoted name") {
    val df = Seq(
      "Alice Smith <alice@example.com>",
      "bob@example.com",
      "\"Carol X\" <carol@x.org>").toDF("a")
    val got = df.select(parseAddrName(col("a")), parseAddrEmail(col("a")))
      .as[(String, String)].collect()
    assert(got(0) == ("Alice Smith", "alice@example.com"))
    assert(got(1) == ("", "bob@example.com"))
    assert(got(2) == ("Carol X", "carol@x.org"))
  }

  test("F6 recipients split drops empties") {
    val got = Seq("a@x.com, Bob <b@y.com>, , c@z.com")
      .toDF("r").select(splitRecipients(col("r"))).as[Seq[String]].collect()(0)
    assert(got == Seq("a@x.com", "b@y.com", "c@z.com"))
  }

  test("F6 recipients split keeps quoted display-name commas intact") {
    import graft.functions.EmailFunctions.splitRecipients
    val got = one(splitRecipients(
      lit("\"Doe, John\" <j@x.com>, plain@y.com, \"Smith, Anna\" <a@z.com>")))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got == Seq("j@x.com", "plain@y.com", "a@z.com"))
  }

  test("F9 entity decode order: author-escaped entities stay literal text") {
    import graft.functions.EmailFunctions.htmlToMarkdown
    // "&amp;lt;b&amp;gt;" means the literal 8 chars "&lt;b&gt;" — decoding
    // &amp; first would turn it into real markup
    assert(one(htmlToMarkdown(lit("use &amp;lt;b&amp;gt; for bold")))
      == "use &lt;b&gt; for bold")
  }

  test("F16 docx (zip container) with declared OOXML type is not a mime mismatch") {
    import graft.functions.EmailFunctions.validationReport
    val zipMagic = Array[Byte](0x50, 0x4b, 0x03, 0x04, 1, 2, 3, 4)
    val report = one(validationReport(lit("report.docx"),
      lit("application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
      lit(zipMagic))).asInstanceOf[org.apache.spark.sql.Row]
    assert(report.getAs[Boolean]("is_safe"),
      s"docx flagged: ${report.getAs[scala.collection.Seq[String]]("issues")}")
    // a zip payload declared as pdf IS still a mismatch
    val bad = one(validationReport(lit("x.pdf"), lit("application/pdf"),
      lit(zipMagic))).asInstanceOf[org.apache.spark.sql.Row]
    assert(bad.getAs[scala.collection.Seq[String]]("issues").contains("mime_mismatch"))
  }

  test("F7 RFC-2822 date fallback chain; unparseable → null") {
    val df = Seq(
      "Mon, 15 Jan 2024 10:30:00 +0000",
      "15 Jan 2024 10:30:00",
      "2024-01-15 10:30:00",
      "garbage").toDF("d")
    val got = df.select(parseRfc2822(col("d")).cast("string")).as[String].collect()
    assert(got(0) == "2024-01-15 10:30:00")
    assert(got(1) == "2024-01-15 10:30:00")
    assert(got(2) == "2024-01-15 10:30:00")
    assert(got(3) == null)
  }

  test("F7 honors timezone offsets") {
    val got = Seq("Mon, 15 Jan 2024 10:30:00 +0200").toDF("d")
      .select(parseRfc2822(col("d")).cast("string")).as[String].collect()(0)
    assert(got == "2024-01-15 08:30:00")
  }

  test("F8 urlsafe base64 → utf8; invalid → null") {
    val enc = b64url("hello world")
    val got = Seq(enc, "!!!not-base64!!!").toDF("b")
      .select(urlsafeB64Text(col("b"))).as[String].collect()
    assert(got(0) == "hello world")
    assert(got(1) == null)
  }

  test("F9 html→markdown: strips tags/script/pixel, keeps links, entities") {
    val html = """<html><style>p{}</style><script>evil()</script>
      |<p>Hi &amp; welcome</p><img width="1" height="1" src="t.gif">
      |<a href="http://x.org">link</a><br>Bye</html>""".stripMargin
    val got = Seq(html).toDF("h").select(htmlToMarkdown(col("h"))).as[String].collect()(0)
    assert(!got.contains("<"))
    assert(!got.contains("evil"))
    assert(!got.contains("t.gif"))
    assert(got.contains("Hi & welcome"))
    assert(got.contains("[link](http://x.org)"))
  }

  test("F9 body selection: markdown from html only when plain absent") {
    val df = Seq(
      (Some("plain"), Some("<p>html</p>")),
      (None: Option[String], Some("<p>html</p>")),
      (Some("plain"), None: Option[String])).toDF("p", "h")
    val got = df.select(bodyMarkdown(col("p"), col("h"))).as[String].collect()
    assert(got(0) == "plain")
    assert(got(1) == "html")
    assert(got(2) == "plain")
  }

  test("F2 tsTokens: lowercase, stopwords, stem") {
    val got = Seq("The running Dogs chased; cats quickly!")
      .toDF("t").select(tsTokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got == Seq("runn", "dog", "chas", "cat", "quickly"))
  }

  test("F4 tsRank: more term hits rank higher; rank in [0,1)") {
    val df = Seq(
      "spark spark spark join",
      "spark only once here",
      "nothing relevant").toDF("t")
    val ranks = df.select(tsRank(col("t"), "spark join")).as[Double].collect()
    assert(ranks(0) > ranks(1) && ranks(1) > ranks(2))
    assert(ranks(2) == 0.0)
    assert(ranks.forall(r => r >= 0.0 && r < 1.0))
  }

  test("F15/F17 dangerous extension + sanitize") {
    val got = Seq("evil.exe", "../../etc/passwd", "report.pdf", "noext")
      .toDF("f")
      .select(hasDangerousExtension(col("f")), sanitizeFilename(col("f")))
      .as[(Boolean, String)].collect()
    assert(got(0) == (true, "evil.exe.txt"))
    assert(got(1)._2 == "passwd.txt")
    assert(got(2) == (false, "report.pdf"))
    assert(got(3)._2 == "noext.txt")
  }

  test("F16 validation report: magic sniff + mismatch + blocklist") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)
    val df = Seq(
      ("img.png", "image/png", png),
      ("fake.png", "application/pdf", png),
      ("evil.js", "text/plain", "alert(1)".getBytes("UTF-8"))
    ).toDF("f", "m", "d")
    val got = df.select(validationReport(col("f"), col("m"), col("d")).as("r"))
      .select("r.is_safe", "r.detected_mime_type", "r.issues").collect()
    assert(got(0).getBoolean(0))
    assert(got(0).getString(1) == "image/png")
    assert(!got(1).getBoolean(0))
    assert(got(1).getSeq[String](2).contains("mime_mismatch"))
    assert(got(2).getSeq[String](2).contains("dangerous_extension"))
  }

  test("F18 suspicious scan") {
    val got = Seq(
      "Please VERIFY YOUR ACCOUNT now <script>x</script>",
      "totally normal message").toDF("b")
      .select(suspiciousScan(col("b")).as("s"))
      .select("s.has_suspicious_content", "s.issues").collect()
    assert(got(0).getBoolean(0))
    assert(got(0).getSeq[String](1).toSet == Set("script_tag", "phish_verify"))
    assert(!got(1).getBoolean(0))
  }

  test("F19 embedding text: caps, recipient slice, label exclusion") {
    val df = Seq((
      "Subj", "Alice", "a@x.com",
      Seq("r1@x", "r2@x", "r3@x", "r4@x", "r5@x", "r6@x", "r7@x"),
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00"),
      "B" * 20000,
      Seq("INBOX", "IMPORTANT", "UNREAD"))).toDF(
      "subject", "sender_name", "sender", "recipients", "date", "body", "labels")
    val got = df.select(embeddingText(col("subject"), col("sender_name"),
      col("sender"), col("recipients"), col("date"), col("body"), col("labels")))
      .as[String].collect()(0)
    assert(got.contains("Subject: Subj"))
    assert(got.contains("r5@x") && !got.contains("r6@x"))
    assert(got.contains("Labels: IMPORTANT") && !got.contains("INBOX"))
    assert(got.length < 10200)
  }

  test("F24 frontmatter render/parse round trip") {
    val df = Seq(("m1", "t1", "A \"quoted\" subject", "a@x.com",
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), Seq("L1", "L2")))
      .toDF("mid", "tid", "subj", "from", "date", "labels")
    val md = df.select(concat_ws("\n",
      renderFrontmatter(col("mid"), col("tid"), col("subj"), col("from"),
        col("date"), col("labels")),
      lit(""), lit("body text")).as("md"))
    val parts = md.select(splitFrontmatter(col("md")).as("p"))
      .select("p.frontmatter", "p.content").as[(String, String)].collect()(0)
    assert(parts._1.contains("subject: \"A \\\"quoted\\\" subject\""))
    assert(parts._1.contains("labels: [\"L1\",\"L2\"]"))
    assert(parts._2.trim == "body text")
  }

  test("F20/F21 token truncation + cost estimate") {
    val t = one(truncateToTokenLimit(lit("x" * 50000))).asInstanceOf[String]
    assert(t.length == MaxEmbedTokens * 4)
    val cost = one(costEstimate(lit(1000), lit(500))).asInstanceOf[Double]
    assert(math.abs(cost - 0.01) < 1e-12)
  }
}
