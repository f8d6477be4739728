package graft

import org.apache.spark.sql.functions._

/** Model-based data selection: DSIR importance weighting and the
  * Naive-Bayes classifier train/score loop (SelectionQueries). The oracle
  * pins bit-level parity; these specs pin the SEMANTICS — that the learned
  * models actually separate what they were trained to separate. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docsFixture(rows: Seq[(Long, String, String, String)]): String = {
    val dir = tmpDir("selection")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String)(dir: String) = SparkEntry.queries(name)(spark, dir)

  test("classifier_nb_score: disjoint-vocabulary classes separate perfectly") {
    // en docs speak vocabulary A, zh docs vocabulary B — a Naive-Bayes
    // model trained on the token stream must classify every doc correctly.
    val en = "spark shuffle partition broadcast catalyst tungsten codegen"
    val zh = "uno dos tres cuatro cinco seis siete ocho"
    val dir = docsFixture(Seq(
      (0L, en, "en", "s0"), (1L, en + " spark catalyst", "en", "s0"),
      (2L, "broadcast codegen tungsten shuffle spark", "en", "s1"),
      (3L, zh, "zh", "s1"), (4L, zh + " uno dos", "zh", "s2"),
      (5L, "siete ocho cinco tres uno", "zh", "s2")))
    val res = q("classifier_nb_score")(dir)
      .select($"doc_id", $"predicted", $"actual")
      .as[(Long, Boolean, Boolean)].collect()
    assert(res.length == 6)
    res.foreach { case (id, p, a) =>
      assert(p == a, s"doc $id predicted $p but actual $a")
    }
  }

  test("classifier_nb_train: learned ratios favor the class that owns the token") {
    val dir = docsFixture(Seq(
      (0L, "alpha alpha alpha", "en", "s0"),
      (1L, "beta beta beta", "zh", "s0")))
    val rows = q("classifier_nb_train")(dir)
      .select($"bucket", $"c_pos", $"c_neg", $"ratio")
      .as[(Long, Long, Long, Double)].collect()
    // two occupied buckets: alpha's (en-only) and beta's (zh-only)
    assert(rows.length == 2)
    val byPos = rows.map(r => (r._2 > 0) -> r._4).toMap
    assert(byPos(true) > 1.0, "en-owned token must have ratio > 1")
    assert(byPos(false) < 1.0, "zh-owned token must have ratio < 1")
  }

  test("select_dsir: target-like documents outweigh dissimilar ones; top-k is per-source") {
    // src0 is the target slice. doc 10 (not in src0) shares the target's
    // bigrams; doc 11 speaks a disjoint language — its weight must be lower.
    val tgt = "quality filtered curated deduplicated tokenized corpus ready"
    val other = "noise spam boilerplate junk repeated repeated repeated garbage"
    val dir = docsFixture(Seq(
      (0L, tgt, "en", "src0"), (1L, tgt + " quality filtered", "en", "src0"),
      (10L, "curated deduplicated tokenized corpus quality filtered", "en", "srcA"),
      (11L, other, "en", "srcA"),
      (12L, other + " junk noise", "en", "srcA"),
      (13L, "filtered curated corpus tokenized", "en", "srcB")))
    val res = q("select_dsir")(dir)
      .select($"doc_id", $"weight", $"keep_topk", $"src_rank")
      .as[(Long, Double, Boolean, Long)].collect()
    val w = res.map(r => r._1 -> r._2).toMap
    assert(w(10L) > w(11L),
      s"target-like doc weight ${w(10L)} must exceed dissimilar ${w(11L)}")
    assert(w(10L) > w(12L))
    // every source keeps min(5, |source|) docs under keep_topk
    val kept = res.filter(_._3).map(_._1).toSet
    assert(Set(0L, 1L, 13L).subsetOf(kept), "small sources keep everything")
    assert(kept.intersect(Set(10L, 11L, 12L)).size == 3, "srcA has 3 <= 5 docs")
    // ranks within a source are a permutation of 1..n
    assert(res.filter(r => Set(10L, 11L, 12L)(r._1)).map(_._4).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("mix_epochs: each doc repeats exactly n_epochs times with distinct order keys") {
    val dir = docsFixture(Seq(
      (0L, "alpha beta", "en", "wiki"), (1L, "gamma delta", "en", "wiki"),
      (2L, "epsilon zeta", "en", "crawl"), (3L, "eta theta", "en", "books")))
    val res = q("mix_epochs")(dir)
      .select($"doc_id", $"n_epochs", $"epoch", $"order_key")
      .as[(Long, Long, Long, String)].collect()
    // same source → same epoch count; epochs enumerate 1..n
    val byDoc = res.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val n = rows.head._2
      assert(rows.map(_._3).sorted.toSeq == (1L to n), s"doc $id epochs")
    }
    assert(byDoc(0L).head._2 == byDoc(1L).head._2, "same source, same epochs")
    assert(res.map(_._4).distinct.length == res.length, "order keys unique")
    assert(res.length.toLong == byDoc.view.mapValues(_.head._2).values.sum)
  }

  test("order_curriculum: easy-first within source, round-robin across sources") {
    val dir = docsFixture(Seq(
      (0L, "a", "en", "s0"), (1L, "bb cc dd ee ff gg", "en", "s0"),
      (2L, "hh ii", "en", "s1"), (3L, "jj kk ll mm nn oo pp qq", "en", "s1"),
      (4L, "r", "en", "s2")))
    val res = q("order_curriculum")(dir)
      .select($"doc_id", $"source", $"src_rank", $"global_pos")
      .as[(Long, String, Long, Long)].collect()
    val pos = res.map(r => r._1 -> r._4).toMap
    // within each source the shorter doc ranks first
    assert(pos(0L) < pos(1L) && pos(2L) < pos(3L))
    // round-robin: all rank-1 docs precede every rank-2 doc
    val rank1 = res.filter(_._3 == 1L).map(_._4).max
    val rank2 = res.filter(_._3 == 2L).map(_._4).min
    assert(rank1 < rank2, "interleave puts every source's easiest doc first")
    // arithmetic positions: rank-1 docs sit at 0..n_src-1
    assert(res.filter(_._3 == 1L).map(_._4).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("report_source_overlap: cross-source dup pairs land in the right matrix cell") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsFixture(Seq(
      (0L, dup, "en", "ccA"), (1L, dup, "en", "ccB"),   // cross-source pair
      (2L, dup, "en", "ccA"),                            // in-source pair with 0
      (3L, "one two three four five six seven", "en", "ccB")))
    val res = q("report_source_overlap")(dir)
      .select($"source_1", $"source_2", $"n_pairs")
      .as[(String, String, Long)].collect().toSet
    // pairs: (0,1) ccA-ccB, (0,2) ccA-ccA, (1,2) ccA-ccB
    assert(res == Set(("ccA", "ccB", 2L), ("ccA", "ccA", 1L)))
  }

  test("select_dsir and classifier_nb_score are deterministic across runs") {
    val dir = docsFixture(Seq(
      (0L, "alpha beta gamma delta", "en", "src0"),
      (1L, "beta gamma delta epsilon", "zh", "s1"),
      (2L, "zeta eta theta iota", "en", "s2")))
    def snap(name: String) = q(name)(dir).collect().toSeq
    assert(snap("select_dsir") == snap("select_dsir"))
    assert(snap("classifier_nb_score") == snap("classifier_nb_score"))
  }
}
