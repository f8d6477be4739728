package graft

import graft.enrich._
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("H1 hash embedder: deterministic, normalized, zero for empty") {
    val e = new HashEmbedder(dim = 64)
    val Seq(v1, v2, vEmpty) = e.embedBatch(Seq("hello", "hello", "")).toSeq
    assert(v1.toSeq == v2.toSeq)
    assert(vEmpty.forall(_ == 0.0f))
    val norm = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embedBatch(Seq("other")).head.toSeq != v1.toSeq)
  }

  test("H1 embedBacklog: batches inside partitions, order-preserving join-back") {
    val backlog = (1L to 250L).map(i => (i, s"text $i")).toDF("id", "embed_text")
    val got = Enrichment.embedBacklog(backlog, new HashEmbedder(dim = 16), batchSize = 100)
    assert(got.count() == 250)
    val direct = new HashEmbedder(dim = 16).embedBatch(Seq("text 7")).head.toSeq
    val fromJob = got.filter($"id" === 7L).as[(Long, Seq[Float])].collect()(0)._2
    assert(fromJob == direct)
  }

  test("G4 retry: recovers after transient failures, rethrows at cap") {
    var calls = 0
    val got = Enrichment.retry(3, baseMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient") else 42
    }
    assert(got == 42 && calls == 3)
    intercept[RuntimeException] {
      Enrichment.retry(2, baseMs = 1) { throw new RuntimeException("always") }
    }
  }

  test("H2 categorize: deterministic rules, priority, action flag") {
    val emails = Seq(
      (1L, "Project deadline meeting", "please review the report"),
      (2L, "50% discount offer!!!", "free winner prize"),
      (3L, "misc", "nothing special")
    ).toDF("id", "subject", "body_plain").withColumn("body_markdown", col("body_plain"))
    val got = Enrichment.categorize(emails, new StubCategorizer)
      .orderBy("id").collect()
    assert(got(0).getAs[String]("primary_category") == "Work/Business")
    assert(got(0).getAs[Boolean]("action_required"))
    assert(got(1).getAs[String]("primary_category") == "Spam/Promotional")
    assert(got(2).getAs[String]("primary_category") == "Other")
  }

  test("H4 action extraction: trigger sentences -> exploded tagged items") {
    val emails = Seq(
      (1L, "s1", "a@x.com", java.sql.Timestamp.valueOf("2024-01-10 10:00:00"),
        "Please review the doc. Also URGENT: please sign off. Nothing else."),
      (2L, "s2", "b@y.com", java.sql.Timestamp.valueOf("2024-01-11 10:00:00"),
        "no tasks here")
    ).toDF("id", "subject", "sender", "date", "body_plain")
      .withColumn("body_markdown", col("body_plain"))
    val got = Enrichment.extractActions(emails, new StubActionExtractor)
      .orderBy("description").collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[Long]("email_id") == 1L))
    assert(got.map(_.getAs[String]("priority")).toSet == Set("Medium", "High"))
    assert(got.forall(_.getAs[String]("responsible") == "a@x.com"))
  }

  test("H3 thread context: ordered blocks + stats") {
    val ts1 = java.sql.Timestamp.valueOf("2024-01-10 10:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-11 10:00:00")
    val emails = Seq(
      (1L, "t1", "a@x.com", ts2, "second message", "re: hi"),
      (2L, "t1", "b@y.com", ts1, "first message", "hi")
    ).toDF("id", "thread_id", "sender", "date", "body_plain", "subject")
    val r = Enrichment.threadContext(emails).collect()(0)
    assert(r.getAs[Long]("email_count") == 2L)
    assert(r.getAs[Seq[String]]("participants").toSet == Set("a@x.com", "b@y.com"))
    val ctx = r.getAs[String]("context")
    assert(ctx.indexOf("first message") < ctx.indexOf("second message"))
  }

  test("H5 RAG context blocks: caps + similarity surfaced") {
    val hits = Seq((1L, "m1", "subj", "a@x.com", 0.9876, "B" * 5000))
      .toDF("id", "message_id", "subject", "sender", "similarity", "body_plain")
    val got = Enrichment.ragContext(hits).select("context_block").as[String].collect()(0)
    assert(got.contains("Similarity: 0.9876"))
    assert(got.length < 1200)
  }
}
