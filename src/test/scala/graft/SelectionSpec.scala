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

  // A near-dup fixture for the cluster-derived selection ops: docs 0/1/2
  // share one verbatim text across sources src3/src1/src2 (one LSH
  // cluster; the keep rule must pick the src1 copy), docs 10/11 are a
  // same-source pair where 11 carries one extra sentence (longer must
  // win), 20/21 are singletons.
  private val dupText = ("spark catalyst tungsten codegen shuffle exchange " +
    "partition broadcast hash join aggregate window watermark state " +
    "checkpoint lineage stage task executor driver").trim
  // disjoint vocabulary from dupText, so this pair NEVER verifies against
  // the 0/1/2 cluster (token-set jaccard 0) and forms its own component
  private val pairText = ("alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima mike november oscar papa quebec romeo " +
    "sierra tango").trim
  private def clusterFixture(): String = docsFixture(Seq(
    (0L, dupText, "en", "src3"),
    (1L, dupText, "en", "src1"),
    (2L, dupText, "en", "src2"),
    (10L, pairText, "en", "src7"),
    (11L, pairText + " coda finale grand", "en", "src7"),
    (20L, "one two three four five six seven eight nine ten", "en", "src9"),
    (21L, "uno dos tres cuatro cinco seis siete ocho nueve", "zh", "src0")))

  test("dedup_keep_best: best member wins by source priority then length; singletons keep") {
    val res = q("dedup_keep_best")(clusterFixture())
      .select($"doc_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect()
    val keepOf = res.map(r => r._1 -> r._3).toMap
    // cluster {0,1,2}: src1 (doc 1) outranks src2/src3 despite equal length
    assert(keepOf(1L) && !keepOf(0L) && !keepOf(2L))
    // cluster {10,11}: same source, the LONGER doc 11 wins
    assert(keepOf(11L) && !keepOf(10L))
    // singletons keep themselves and are their own cluster
    assert(keepOf(20L) && keepOf(21L))
    assert(res.filter(r => Set(20L, 21L)(r._1)).forall(r => r._1 == r._2))
    // exactly one keep per cluster
    res.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._3) == 1, s"cluster $c keep count")
    }
  }

  test("select_soft_dedup: weights are 1/cluster_size and total mass = one per cluster") {
    val res = q("select_soft_dedup")(clusterFixture())
      .select($"doc_id", $"weight").as[(Long, Double)].collect().toMap
    assert(res(0L) == 1.0 / 3 && res(1L) == 1.0 / 3 && res(2L) == 1.0 / 3)
    assert(res(10L) == 0.5 && res(11L) == 0.5)
    assert(res(20L) == 1.0 && res(21L) == 1.0)
    // expected gradient mass: 3 clusters + ... = one unit per distinct content
    assert(math.abs(res.values.sum - 4.0) < 1e-12)
  }

  test("mix_temperature: sqrt-flattened weights — rare language upsampled, head damped") {
    // 9 en docs + 1 zh doc: w_en = 3/4, w_zh = 1/4; rates 5/6 and 5/2.
    val dir = docsFixture(
      (0L until 9L).map(i => (i, s"english doc $i", "en", "s0")) :+
        ((9L, "zh doc", "zh", "s0")))
    val res = q("mix_temperature")(dir)
      .select($"lang", $"n_docs", $"weight", $"rate")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(res("en")._2 == 9L && res("zh")._2 == 1L)
    assert(math.abs(res("en")._3 - 0.75) < 1e-12)
    assert(math.abs(res("zh")._3 - 0.25) < 1e-12)
    assert(math.abs(res("en")._4 - 10.0 * 0.75 / 9) < 1e-12, "head damped below 1")
    assert(math.abs(res("zh")._4 - 2.5) < 1e-12, "rare language upsampled")
    assert(res("en")._4 < 1.0 && res("zh")._4 > 1.0)
  }

  test("select_stratified: row-local md5 gate — en downsampled, other langs kept whole") {
    val ids = (0L until 64L)
    val dir = docsFixture(
      ids.map(i => (i, s"doc number $i body", if (i % 2 == 0) "en" else "fr", "s0")))
    val kept = q("select_stratified")(dir)
      .select($"doc_id").as[Long].collect().toSet
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((md(0) & 0xff))
    }
    ids.foreach { i =>
      val expect = if (i % 2 == 0) bucket(i) < 90 else true
      assert(kept(i) == expect, s"doc $i: kept=${kept(i)} expected=$expect")
    }
  }

  test("select_ccnet_band: per-language terciles — common-bigram docs head, junk tail") {
    // Four identical en docs (every bigram count 4 >= 3 => score 1.0) and
    // two unique-vocabulary en docs (score 0); one zh pair to prove the
    // window is language-partitioned (its own tercile cut, not en's).
    val common = "alpha beta gamma delta epsilon"
    val dir = docsFixture(
      (1L to 4L).map(i => (i, common, "en", "s0")) ++ Seq(
        (5L, "q1 q2 q3 q4", "en", "s0"),
        (6L, "r1 r2 r3 r4", "en", "s0"),
        (7L, "zz yy xx ww", "zh", "s1"),
        (8L, "vv uu tt ss", "zh", "s1")))
    val out = q("select_ccnet_band")(dir)
      .select($"doc_id", $"lang", $"score", $"band", $"keep")
      .as[(Long, String, Double, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length == 8)
    val en = out.filter(_._2 == "en")
    // ntile(3) over 6 en docs => bands of 2: identical docs fill 1 and 2,
    // the zero-score junk is the tail
    assert(en.filter(_._3 == 1.0).map(_._4).sorted.toSeq == Seq(1, 1, 2, 2))
    assert(en.filter(_._3 == 0.0).map(_._4).toSeq.forall(_ == 3))
    out.foreach { case (id, _, _, band, keep) =>
      assert(keep == (band <= 2), s"doc $id: keep must be band <= 2")
    }
    // zh has its own tercile cut: 2 docs => bands 1 and 2, both kept
    assert(out.filter(_._2 == "zh").map(_._4).sorted.toSeq == Seq(1, 2))
  }

  test("select_ccnet_band_scale: percentile-cut bands agree with the NTILE form away from ties") {
    // Distinct scores, language populations divisible by 3: with n = 3k
    // distinct scores the interpolated 1/3 and 2/3 cuts fall strictly
    // BETWEEN order statistics, so the row-local band comparison selects
    // exactly NTILE's k-per-band split — the only divergence the scale
    // form permits is AT a cut tie, and this fixture plants none.
    // Doc i = one corpus-common bigram + (i-1) unique junk tokens
    // => score 1/i (the bridge bigram into the junk is unique per doc).
    def doc(id: Long, common: String, junkPrefix: String, k: Int, lang: String) =
      (id, (common + " " + (0 until k).map(j => s"$junkPrefix$j").mkString(" ")).trim,
        lang, "s0")
    val dir = docsFixture(
      (1 to 6).map(i => doc(i.toLong, "alpha beta", s"u$i-", i - 1, "en")) ++
        (1 to 3).map(i => doc(10L + i, "zeta eta", s"v$i-", i - 1, "zh")))
    val exact = q("select_ccnet_band")(dir)
      .select($"doc_id", $"band").as[(Long, Long)].collect().toMap
    val scale = q("select_ccnet_band_scale")(dir)
      .select($"doc_id", $"lang", $"score", $"band", $"keep")
      .as[(Long, String, Double, Long, Boolean)].collect().sortBy(_._1)
    assert(scale.length == 9)
    scale.foreach { case (id, _, _, band, keep) =>
      assert(band == exact(id), s"doc $id: scale band $band != ntile ${exact(id)}")
      assert(keep == (band <= 2), s"doc $id: keep must be band <= 2")
    }
    // en: scores 1, 1/2 head; 1/3, 1/4 middle; 1/5, 1/6 tail
    val en = scale.filter(_._2 == "en").map(t => t._1 -> t._4).toMap
    assert(en == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 3L))
    // zh gets its OWN cuts: scores 1, 1/2, 1/3 -> bands 1, 2, 3
    val zh = scale.filter(_._2 == "zh").map(t => t._1 -> t._4).toMap
    assert(zh == Map(11L -> 1L, 12L -> 2L, 13L -> 3L))
  }

  test("report_drift: on-distribution sources read ~0, a divergent source reads high") {
    // s0/s1 share the same token mixture (drift ~ 0 up to per-bucket
    // rounding); s2 speaks a disjoint vocabulary — its L1 distance
    // from the corpus mixture must dominate.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsFixture(Seq(
      (1L, shared, "en", "s0"), (2L, shared, "en", "s0"),
      (3L, shared, "en", "s1"), (4L, shared, "en", "s1"),
      (5L, "qq ww ee rr tt yy uu ii", "en", "s2")))
    val out = q("report_drift")(dir)
      .select($"source", $"drift").as[(String, Double)].collect().toMap
    assert(out.keySet == Set("s0", "s1", "s2"))
    out.values.foreach(d => assert(d >= 0.0 && d <= 2.0 + 1e-9,
      "L1 distance between distributions is bounded by 2"))
    // s0 and s1 have the identical token multiset => identical drift rows
    assert(out("s0") == out("s1"), s"same-mixture sources must read equal: $out")
    // s2 shares no tokens with the rest: its observed mass is only its own
    // corpus share, so its drift must dominate the on-mixture sources'
    assert(out("s2") > out("s0") + 0.5,
      s"disjoint-vocabulary source must read far higher, got $out")
  }

  test("vocab_coverage: OOV rates match the brute-force top-256 vocabulary rule") {
    // > 256 distinct tokens so the vocab cut actually excludes something:
    // 50 repeated tokens (count 3) plus 300 singletons split across two
    // sources. Expected values re-derived brute-force from the fixture.
    val repeated = (0 until 50).map(i => f"w$i%02d")
    val single = (0 until 300).map(i => f"x$i%03d")
    val rows = Seq(
      (1L, (repeated ++ repeated ++ single.take(150)).mkString(" "), "en", "s0"),
      (2L, (repeated ++ single.drop(150)).mkString(" "), "en", "s1"))
    val dir = docsFixture(rows)
    val counts = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(256).map(_._1).toSet
    val out = q("vocab_coverage")(dir)
      .select($"source", $"n_tokens", $"n_oov", $"oov_rate", $"oov_types")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (_, text, _, src) =>
      val toks = text.split(" ").toSeq
      val oov = toks.filterNot(vocab)
      val (got) = out(src)
      assert(got._2 == toks.size, s"$src n_tokens")
      assert(got._3 == oov.size, s"$src n_oov")
      assert(math.abs(got._4 - oov.size.toDouble / toks.size) < 1e-15, s"$src rate")
      assert(got._5 == oov.distinct.size, s"$src oov_types")
    }
    assert(out.values.map(_._3).sum > 0, "fixture must actually exercise OOV")
  }
}
