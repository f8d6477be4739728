package graft

import graft.queries.WebQueries
import org.apache.spark.sql.functions._

/** URL canonicalization + URL dedup properties beyond the oracle: unit
  * fixtures for each canonicalization rule, idempotence, keep-best
  * selection, and the planted-collision density the synth guarantees. */
class WebQueriesSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def canon(urls: String*): Seq[String] =
    urls.toDF("raw").select(WebQueries.canonicalize(col("raw")))
      .as[String].collect().toSeq

  /** documents fixture with a contiguous doc_id range (the synth URL
    * collisions need ids ~300 apart — wider than sf0.001's 50 docs). */
  private def idsFixture(n: Int): String = {
    val dir = tmpDir("web")
    (0 until n).map(i => (i.toLong, s"text $i"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("canonicalization rules: case, www, default ports, slash, utm, sort, fragment") {
    assert(canon(
      "HTTPS://WWW.Site.DOM2.net:443/p/9/?utm_x=1&b=2&a=1#frag",
      "http://example.com:80/a",
      "http://example.com:8080/a/",
      "https://www.ex.org/a?utm_source=x",
      "http://ex.org/a?x=1",
      "HTTP://EX.org:80/a/?b=2&a=1#s"
    ) == Seq(
      "https://site.dom2.net/p/9?a=1&b=2",
      "http://example.com/a",
      "http://example.com:8080/a",
      "https://ex.org/a",
      "http://ex.org/a?x=1",
      "http://ex.org/a?a=1&b=2"))
  }

  test("malformed URLs degrade gracefully under ANSI mode (no throw): scheme-less, path-less, single-label host") {
    // one bad record must not kill a streaming drain — these would throw
    // from an unguarded element_at under Spark's default ANSI mode
    assert(canon(
      "example.org/x",
      "http://localhost",
      "HTTPS://Host.Org"
    ) == Seq(
      "http://example.org/x",
      "http://localhost",
      "https://host.org"))
    val d = Seq("localhost").toDF("h")
      .select(WebQueries.domainOf(col("h"))).as[String].collect()
    assert(d.toSeq == Seq("localhost"))
  }

  test("canonicalization is idempotent on every synthesized URL") {
    val raws = Tables.documents(spark, sf)
      .select(WebQueries.rawUrlCol(col("doc_id")).as("raw"))
    val twice = raws
      .select(WebQueries.canonicalize(col("raw")).as("c1"))
      .select(col("c1"), WebQueries.canonicalize(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2"))
    assert(twice.count() == 0L)
  }

  test("registered-domain extraction takes the last two host labels") {
    val got = Seq("a.b.c.d", "x.y", "s0.dom0.com").toDF("h")
      .select(WebQueries.domainOf(col("h"))).as[String].collect().toSeq
    assert(got == Seq("c.d", "x.y", "dom0.com"))
  }

  test("dedup_url finds the planted collisions and keeps best-by (n_chars DESC, doc_id)") {
    val dir = idsFixture(700)
    val groups = SparkEntry.queries("dedup_url")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(groups.nonEmpty, "700 contiguous ids must collide (d vs d+300)")
    // recompute membership independently
    val members = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        WebQueries.canonicalize(WebQueries.rawUrlCol(col("doc_id")))
          .as("canon_url"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._3)
    groups.foreach { case (cu, nDups, keptId, keptChars) =>
      val m = members(cu)
      assert(m.length.toLong == nDups && nDups >= 2L)
      val best = m.minBy(r => (-r._2, r._1))
      assert(best._1 == keptId && best._2 == keptChars)
    }
    // and every >=2 group is reported
    assert(groups.length == members.count(_._2.length >= 2))
  }

  test("url_quality_gate: verdict is exactly the conjunction of its features") {
    val rows = SparkEntry.queries("url_quality_gate")(spark, sf)
      .as[(Long, Long, Long, Double, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, depth, nParams, digitFrac, tracked, _, pass) =>
      assert(pass == (!tracked && nParams <= 2 && depth <= 4 && digitFrac <= 0.5),
        s"doc $id verdict mismatch")
      assert(tracked == (id % 4 == 0 || id % 4 == 1), s"doc $id tracked flag")
    }
    // the gate must split the corpus, not rubber-stamp it
    assert(rows.exists(_._7) && rows.exists(!_._7))
  }

  test("gate totality (adversarial shapes): bare host passes with digit_frac 0, query-without-path keeps its params") {
    val rows = SparkEntry.queries("url_gate_adversarial")(spark, sf)
      .select("doc_id", "canon_url", "digit_frac", "pass")
      .as[(Long, String, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // http://example.com: empty canonical path — the 0/0 Divide would
    // read NULL without the guard; the verdict must be a real boolean
    assert(rows(2L)._3 == 0.0 && rows(2L)._4,
      "bare-host URL must pass the gate with digit_frac 0.0, not NULL")
    assert(rows(1L)._2 == "http://example.com" && rows(1L)._4,
      "scheme-less bare host canonicalizes to the http form and passes")
    // query with no path: the authority split must stop at '?', so the
    // params survive into the sorted-query canonical form
    assert(rows(9L)._2 == "http://example.com?x=1")
    assert(!rows(7L)._4, "digit-heavy path must fail the digit_frac rule")
    assert(!rows(8L)._4, "depth-6 path must fail the path_depth rule")
  }

  test("web_domain_prior: per-domain stats agree with a direct recount") {
    val prior = SparkEntry.queries("web_domain_prior")(spark, sf)
      .select("domain", "domain_docs").distinct()
      .as[(String, Long)].collect().toMap
    val direct = Tables.documents(spark, sf)
      .select(WebQueries.domainOf(WebQueries.hostOf(
        WebQueries.rawUrlCol(col("doc_id")))).as("d"))
      .groupBy("d").count().as[(String, Long)].collect().toMap
    prior.foreach { case (d, n) => assert(direct(d) == n, s"domain $d") }
  }
}
