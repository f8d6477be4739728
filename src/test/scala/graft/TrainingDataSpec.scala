package graft

import org.apache.spark.sql.functions._

/** Properties of the training-data export operators that the DuckDB oracle
  * can't express: the int8 quantization error envelope, packing manifest
  * invariants, semantic-dedup cluster soundness vs the unblocked
  * threshold graph, and fixture-driven substring/LM behavior.
  * (RegistryDeterminismSpec covers run-to-run determinism for all of
  * them automatically; the driver oracle covers value correctness.) */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Write a tiny documents.parquet fixture and return its dir. */
  private def docsFixture(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("traindata")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_boilerplate_strip: per-source scope, ALL occurrences stripped (no keep-first)") {
    val dir = tmpDir("boiler")
    val tile = (1 to 8).map(i => s"b$i").mkString(" ")
    def tail(p: String) = (1 to 8).map(i => s"$p$i").mkString(" ")
    Seq(
      (0L, s"$tile ${tail("u")}", "sa"),
      (1L, s"$tile ${tail("v")}", "sa"),
      (2L, s"$tile ${tail("w")}", "sb"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_boilerplate_strip")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // source sa: the shared tile is in 2 distinct docs -> stripped from
    // BOTH (dedup_paragraph would have kept doc 0's copy)
    assert(got(0L) == (1L, tail("u")))
    assert(got(1L) == (1L, tail("v")))
    // source sb holds the tile once -> untouched (per-source scope)
    assert(got(2L) == (0L, s"$tile ${tail("w")}"))
  }

  test("ann_int8_knn: quantized cosine tracks float cosine within the int8 envelope") {
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val qv = emb.filter($"vec_id" === 0L).select($"embedding".as("qv"))
    val exact = emb.filter($"vec_id" =!= 0L).crossJoin(broadcast(qv))
      .select($"vec_id",
        graft.functions.VectorFunctions.cosineSim($"embedding", $"qv").as("sim"))
    val got = q("ann_int8_knn").join(exact, "vec_id")
      .select($"qsim", $"sim").as[(Double, Double)].collect()
    assert(got.length == 10)
    // 8-bit symmetric quantization of 64-dim vectors: per-element relative
    // error <= 1/254, cosine estimate error well under 2e-2 in practice
    got.foreach { case (qs, s) =>
      assert(math.abs(qs - s) < 0.02, s"quantized $qs vs exact $s")
    }
  }

  test("select_diverse_buckets: one min-md5 representative per occupied bucket, sizes conserve") {
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
      .withColumn("bucket",
        graft.queries.VectorSearchQueries.bucketCol($"embedding", 8))
      .withColumn("h", md5($"vec_id".cast("string")))
    val expected = emb.select($"bucket", $"h", $"vec_id")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (b, ms) => b -> ms.minBy(m => (m._2, m._3))._3 }
    val got = SparkEntry.queries("select_diverse_buckets")(spark, sf)
      .select($"bucket", $"vec_id", $"bucket_size")
      .as[(String, Long, Long)].collect()
    assert(got.length == expected.size, "one row per occupied bucket")
    got.foreach { case (b, id, _) =>
      assert(expected(b) == id, s"bucket $b representative")
    }
    assert(got.map(_._3).sum == emb.count(), "bucket sizes conserve the corpus")
  }

  test("text_pii_stats: ordered-pass counts on a PII-laden fixture (the sf corpus has none)") {
    val dir = docsFixture(Seq(
      (1L, "contact a.b@example.com or https://ex.com/a?x=1 call 415-555-0132"),
      (2L, "no pii here at all"),
      (3L, "u@v.io and w@x.org then 1234567 via https://a.b https://c.d")))
    val rows = SparkEntry.queries("text_pii_stats")(spark, dir)
      .select($"doc_id", $"n_urls", $"n_emails", $"n_numbers")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: the URL pass runs FIRST, so its trailing "?x=1" digit never
    // reaches the number pass; the phone number has 10 digits >= 7
    assert(rows(1L) == ((1L, 1L, 1L, 1L)))
    assert(rows(2L) == ((2L, 0L, 0L, 0L)))
    assert(rows(3L) == ((3L, 2L, 2L, 1L)))
  }

  test("dedup_semantic_incremental: delta flags equal the global bucket-blocked rule restricted to the delta") {
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
      .withColumn("bucket",
        graft.queries.VectorSearchQueries.bucketCol($"embedding", 8))
    val split = Tables.embeddings(spark, sf).agg(max($"vec_id")).head.getLong(0) / 2
    val a = emb.select($"vec_id".as("a_id"), $"bucket", $"embedding".as("va"))
    val b = emb.select($"vec_id".as("b_id"), $"bucket", $"embedding".as("vb"))
    val expected = a.join(b, Seq("bucket"))
      .filter($"a_id" < $"b_id" && $"b_id" > split)
      .filter(graft.functions.VectorFunctions.cosineSim($"va", $"vb") >= 0.35)
      .select($"b_id").distinct().as[Long].collect().toSet
    val got = SparkEntry.queries("dedup_semantic_incremental")(spark, sf)
      .select($"vec_id", $"is_dup").as[(Long, Boolean)].collect()
    assert(got.nonEmpty && got.forall(_._1 > split))
    got.foreach { case (id, dup) =>
      assert(dup == expected(id), s"vec $id: flagged=$dup expected=${expected(id)}")
    }
  }

  test("select_prototypes_scale: centroid argmax agrees with the exact medoid on well-separated classes") {
    // Two tight, well-separated clusters, each with one clearly-central
    // member: the O(class^2) medoid and the one-pass centroid argmax must
    // pick the same prototype. A third singleton class is covered only by
    // the scale form (the medoid needs peers) — it represents itself.
    val dir = tmpDir("protoscale")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    Seq(
      (0L, v(1.0f), 0), (1L, v(0.8f, 0.2f), 0), (2L, v(0.8f, -0.2f), 0),
      (10L, v(0.0f, 1.0f), 1), (11L, v(0.2f, 0.8f), 1), (12L, v(-0.2f, 0.8f), 1),
      (20L, v(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val exact = SparkEntry.queries("select_prototypes")(spark, dir)
      .select($"label", $"prototype_id").as[(Int, Long)].collect().toMap
    val scale = SparkEntry.queries("select_prototypes_scale")(spark, dir)
      .select($"label", $"prototype_id", $"class_size", $"centroid_sim")
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(exact.keySet == Set(0, 1), "medoid form needs >= 2 members")
    assert(scale.keySet == Set(0, 1, 2), "scale form covers singletons too")
    Seq(0, 1).foreach { l =>
      assert(scale(l)._2 == exact(l),
        s"class $l: centroid argmax ${scale(l)._2} != medoid ${exact(l)}")
    }
    assert(scale(0)._2 == 0L && scale(1)._2 == 10L, "the central members win")
    assert(scale(2)._2 == 20L && scale(2)._3 == 1L)
    assert(math.abs(scale(2)._4 - 1.0) < 1e-9, "a singleton IS its centroid")
  }

  test("select_embed_outliers: the anti-aligned member is the outlier; aligned members are not") {
    // label 0: three vectors near +e1 and one at -e1 (the outlier);
    // label 1: two near +e2 — per-class centroids must separate them.
    val dir = tmpDir("embout")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    Seq(
      (0L, v(1.0f), 0), (1L, v(0.9f, 0.1f), 0), (2L, v(0.95f, -0.05f), 0),
      (3L, v(-1.0f), 0),
      (10L, v(0.0f, 1.0f), 1), (11L, v(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = SparkEntry.queries("select_embed_outliers")(spark, dir)
      .select($"vec_id", $"centroid_sim", $"is_outlier")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(res(3L)._2, "anti-aligned vector must be flagged")
    Seq(0L, 1L, 2L, 10L, 11L).foreach { id =>
      assert(!res(id)._2, s"vec $id wrongly flagged (sim=${res(id)._1})")
      assert(res(id)._1 > 0.5, s"aligned vec $id sim ${res(id)._1}")
    }
  }

  test("pack_sequences: manifest invariants — contiguous offsets, correct seq math") {
    val rows = q("pack_sequences")
      .select($"doc_id", $"shard", $"n_tok", $"start_off", $"seq_id", $"seq_off")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      var expected = 0L
      inOrder.foreach { case (id, _, nTok, startOff, seqId, seqOff) =>
        assert(startOff == expected, s"doc $id offset $startOff != running sum $expected")
        assert(seqId == startOff / 256, s"doc $id seq_id")
        assert(seqOff == startOff % 256 && seqOff < 256, s"doc $id seq_off")
        expected += nTok
      }
    }
    // token totals conserved: sum of n_tok equals last offset + last n_tok per shard
    val total = rows.map(_._3).sum
    assert(total == Tables.documents(spark, sf)
      .select(sum(size(split($"text", " ")).cast("long"))).as[Long].head())
  }

  test("dedup_semantic: clusters are canonical and refine the unblocked threshold graph") {
    val out = q("dedup_semantic")
      .select($"vec_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty, "sf0.001 embeddings should contain semantic near-dups at 0.35")
    val byId = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (v, c, keep) =>
      assert(c <= v, "canonical id is the component minimum")
      assert(keep == (v == c))
      assert(byId(c) == c, s"cluster id $c must itself resolve to $c")
    }
    // blocking only DROPS candidate edges, so every blocked cluster must
    // sit inside one brute-force (unblocked) threshold component
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("vb"))
    val brutePairs = a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(graft.functions.VectorFunctions.cosineSim($"va", $"vb") >= 0.35)
      .select($"a_id", $"b_id")
    val brute = graft.operators.ConnectedComponents.resolve(brutePairs)
      .as[(Long, Long)].collect().toMap
    out.groupBy(_._2).values.foreach { members =>
      val bruteComponents = members.map(m => brute(m._1)).toSet
      assert(bruteComponents.size == 1,
        s"blocked cluster spans brute-force components $bruteComponents")
    }
  }

  test("dedup_semantic_kmeans: canonical clusters that refine the brute-force threshold graph") {
    // same refinement property as the LSH-blocked form: k-means blocking
    // only DROPS candidate edges (pairs straddling a cluster boundary),
    // so every blocked cluster must sit inside ONE unblocked threshold
    // component — the guarantee that the two semantic-dedup blockings
    // are interchangeable up to recall, never up to correctness
    val out = q("dedup_semantic_kmeans")
      .select($"vec_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty, "sf0.001 embeddings should contain semantic near-dups at 0.35")
    val byId = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (v, c, keep) =>
      assert(c <= v && keep == (v == c) && byId(c) == c)
    }
    val emb = Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("vb"))
    val brutePairs = a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(graft.functions.VectorFunctions.cosineSim($"va", $"vb") >= 0.35)
      .select($"a_id", $"b_id")
    val brute = graft.operators.ConnectedComponents.resolve(brutePairs)
      .as[(Long, Long)].collect().toMap
    out.groupBy(_._2).values.foreach { members =>
      val bruteComponents = members.map(m => brute(m._1)).toSet
      assert(bruteComponents.size == 1,
        s"kmeans-blocked cluster spans brute-force components $bruteComponents")
    }
  }

  test("dedup_semantic: identical clusters at the 4-plane default and the pinned 8-plane block") {
    // Each group's members are POSITIVE scalar multiples of a shared base
    // vector: cosine is exactly 1 and every hyperplane dot keeps its
    // sign, so a group occupies one bucket at ANY plane count — the
    // prefix-stable parameterization must therefore produce the same CC
    // clusters whether the block key is 4 or 8+ planes wide. Distinct
    // bases are md5-random ±1 vectors whose pairwise |sim| stays far
    // below the 0.35 threshold (asserted below, deterministic fixture).
    val dims = 64
    def base(g: Int): Seq[Double] =
      (0 until dims).map(i => graft.queries.VectorSearchQueries.planeWeight(100 + g, i))
    val groups = 0 until 4
    for (g1 <- groups; g2 <- groups if g1 < g2) {
      val sim = base(g1).zip(base(g2)).map { case (x, y) => x * y }.sum / dims
      assert(math.abs(sim) < 0.35, s"fixture bases $g1,$g2 too similar: $sim")
    }
    val dir = tmpDir("semfix")
    val rows = for { g <- groups; j <- 0 until 3 } yield
      (g * 10L + j,
        base(g).map(x => (x * (1.0 + 0.05 * j)).toFloat).toArray,
        g)
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def clusters(name: String): Map[Long, Long] =
      SparkEntry.queries(name)(spark, dir)
        .select($"vec_id", $"cluster_id").as[(Long, Long)].collect().toMap
    val adaptive = clusters("dedup_semantic") // n=12 → adaptive p = 4
    val p8 = clusters("dedup_semantic_p8")
    assert(adaptive == p8, "4-plane and 8-plane blocks must yield identical clusters")
    val expected = (for { g <- groups; j <- 0 until 3 }
      yield (g * 10L + j) -> g * 10L).toMap
    assert(adaptive == expected, "each scalar-multiple group is one canonical cluster")
  }

  test("dedup_incremental: delta decisions equal the global keep-first rule restricted to the delta") {
    // The operator's contract: running dedup incrementally (delta probes
    // the base index one-sidedly) must produce EXACTLY the decisions the
    // full batch pipeline would have made for those docs — otherwise the
    // cheap path silently changes the corpus.
    val split = Tables.documents(spark, sf).agg(max($"doc_id")).head.getLong(0) / 2
    val res = q("dedup_incremental").collect()
    val deltaIds = res.map(_.getLong(0))
    assert(deltaIds.distinct.length == deltaIds.length && deltaIds.forall(_ > split))
    val gotDups = res.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val globalDups = q("dedup_minhash_lsh").select($"b_id").distinct()
      .filter($"b_id" > split).as[Long].collect().toSet
    assert(gotDups == globalDups,
      s"incremental flagged $gotDups but the batch rule says $globalDups")
  }

  test("dedup_incremental: flags dups vs base and within-batch, keeps first arrival") {
    val dir = docsFixture(Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "one two three four five six",
      10L -> "alpha beta gamma delta epsilon zeta", // dup of base doc 0
      11L -> "unique words here totally fresh tokens",
      12L -> "red green blue cyan magenta yellow", // first arrival: kept
      13L -> "red green blue cyan magenta yellow")) // within-batch dup of 12
    val got = SparkEntry.queries("dedup_incremental")(spark, dir)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> true, 11L -> false, 12L -> false, 13L -> true))
  }

  test("split_leakage_safe: no verified near-dup pair straddles train/eval") {
    // Fixture guarantees near-dup pairs exist (identical texts), so the
    // invariant is exercised, not vacuous: every pair's two docs must land
    // in the SAME split, and every document must be assigned exactly once.
    val dir = docsFixture(Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six",
      3L -> "one two three four five six",
      4L -> "unique words here totally fresh tokens",
      5L -> "red green blue cyan magenta yellow"))
    val res = SparkEntry.queries("split_leakage_safe")(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(res.map(_._1).toSeq == (0L to 5L))
    val splitOf = res.map(r => r._1 -> r._3).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must produce near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"near-dup pair ($a,$b) straddles ${splitOf(a)}/${splitOf(b)}")
    }
    // members of one cluster share the cluster id (same assignment input)
    val clusterOf = res.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) => assert(clusterOf(a) == clusterOf(b)) }
  }

  test("dedup_substring: shared 8-token spans are detected, unique docs score zero") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val dir = docsFixture(Seq(
      1L -> s"$shared plus some trailing words here one",
      2L -> s"leading words then $shared and more after that",
      3L -> "completely different tokens nothing in common with others at all"))
    val out = SparkEntry.queries("dedup_substring")(spark, dir)
      .select($"doc_id", $"n_shared", $"shared_frac")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 >= 1 && out(1)._2 >= 1, "docs 1 and 2 share the 8-token span")
    assert(out(2)._2 == 0 && out(2)._3 == 0.0, "doc 3 has no shared spans")
  }

  test("dedup_substring_maximal: a 60-token duplicated run is localized exactly; the 8-token screen only counts it") {
    // the run sits at token offset 5 in doc 1 and offset 3 in doc 2;
    // surrounding context is globally unique, so the maximal duplicated
    // span must be EXACTLY the 60 tokens — no bleed into the context
    val run = (1 to 60).map(i => s"dup$i").mkString(" ")
    val pre1 = (1 to 5).map(i => s"a$i").mkString(" ")
    val post1 = (1 to 9).map(i => s"b$i").mkString(" ")
    val pre2 = (1 to 3).map(i => s"c$i").mkString(" ")
    val post2 = (1 to 11).map(i => s"d$i").mkString(" ")
    val dir = docsFixture(Seq(
      1L -> s"$pre1 $run $post1",
      2L -> s"$pre2 $run $post2",
      3L -> (1 to 30).map(i => s"u$i").mkString(" ")))
    val got = SparkEntry.queries("dedup_substring_maximal")(spark, dir)
      .select($"doc_id", $"span_start", $"span_end", $"span_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 65L, 60L), (2L, 3L, 63L, 60L)),
      s"expected exact 60-token localization, got $got")
    // contrast: the fixed-8-token screen reports counts per doc but no
    // span boundaries — the maximal form is what removal needs
    val screen = SparkEntry.queries("dedup_substring")(spark, dir)
      .select($"doc_id", $"n_shared").as[(Long, Long)].collect().toMap
    assert(screen(1L) == 53L, "screen sees the 53 duplicated 8-grams, not the one 60-token span")
  }

  test("dedup_substring_maximal: a within-document repeat is duplicated; overlapping extents merge into one span") {
    // doc 1 repeats the same 8-token phrase twice with a unique gap of 4
    // tokens; each occurrence is a separate maximal span (the gap's grams
    // are unique), and no other doc is involved
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val gap = (1 to 4).map(i => s"g$i").mkString(" ")
    val dir = docsFixture(Seq(
      1L -> s"$phrase $gap $phrase",
      2L -> (1 to 25).map(i => s"v$i").mkString(" ")))
    val got = SparkEntry.queries("dedup_substring_maximal")(spark, dir)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 8L), (1L, 12L, 20L)),
      s"two separated occurrences of the same phrase, got $got")
  }

  test("dedup_substring_maximal: overlapping extents with NON-consecutive starts merge into one maximal span (r11 verdict fixture)") {
    // doc 1 = t0..t9; doc 2 = exactly t0..t7; doc 3 = exactly t2..t9.
    // In doc 1 the 8-grams at start 0 and start 2 are corpus-duplicated
    // but the one at start 1 is not — a flagged-position gap of 2, inside
    // the 2..Tk window the r11 consecutive-start merge got wrong (it
    // emitted OVERLAPPING spans [0,8) and [2,10)). The true maximal
    // duplicated range in doc 1 is the single union span [0,10).
    val t = (0 to 9).map(i => s"t$i")
    val dir = docsFixture(Seq(
      1L -> t.mkString(" "),
      2L -> t.take(8).mkString(" "),
      3L -> t.drop(2).mkString(" ")))
    val got = SparkEntry.queries("dedup_substring_maximal")(spark, dir)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 10L), (2L, 0L, 8L), (3L, 0L, 8L)),
      s"expected ONE merged maximal span per doc, got $got")
    // and the removal accounting agrees with the actual union cut:
    // doc 1 loses all 10 tokens exactly once (removed_frac == 1.0, not 1.6)
    val clean = SparkEntry.queries("dedup_substring_clean")(spark, dir)
      .select($"doc_id", $"n_tok", $"removed_tok", $"removed_frac", $"clean_text")
      .as[(Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(clean(1L) == ((1L, 10L, 10L, 1.0, "")),
      s"doc 1 accounting must match the union cut, got ${clean(1L)}")
    clean.values.foreach { case (id, nTok, removed, frac, _) =>
      assert(removed <= nTok && frac <= 1.0,
        s"doc $id removed_tok $removed exceeds n_tok $nTok")
    }
  }

  test("span family: emitted spans per document are disjoint with strict gaps (sf0.001 + fixtures)") {
    def assertDisjoint(name: String, dir: String): Unit = {
      val spans = SparkEntry.queries(name)(spark, dir)
        .select($"doc_id", $"span_start", $"span_end")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).values
      spans.foreach { perDoc =>
        val sorted = perDoc.sortBy(_._2)
        sorted.foreach { case (id, s, e) =>
          assert(s < e, s"$name: empty/inverted span [$s,$e) in doc $id") }
        sorted.sliding(2).foreach {
          case Array((id, _, e1), (_, s2, _)) =>
            // touching extents must have merged, so the gap is strict
            assert(s2 > e1, s"$name: overlapping/touching spans in doc $id")
          case _ => ()
        }
      }
    }
    // real corpus + the adversarial overlap fixture, all three span queries
    val t = (0 to 9).map(i => s"t$i")
    val fixture = docsFixture(Seq(
      1L -> t.mkString(" "), 2L -> t.take(8).mkString(" "),
      3L -> t.drop(2).mkString(" "),
      // odd/even + benchmark-slice shape so the incremental and
      // contamination variants flag something too
      60L -> t.mkString(" "), 61L -> t.mkString(" ")))
    Seq(sf, fixture).foreach { dir =>
      assertDisjoint("dedup_substring_maximal", dir)
      assertDisjoint("contamination_spans", dir)
      assertDisjoint("dedup_substring_incremental", dir)
    }
  }

  test("dedup_substring_stats: band histogram reconciles with the maximal-span table") {
    val run = (1 to 60).map(i => s"dup$i").mkString(" ")
    val dir = docsFixture(Seq(
      1L -> s"${(1 to 5).map(i => s"a$i").mkString(" ")} $run",
      2L -> s"$run ${(1 to 7).map(i => s"b$i").mkString(" ")}",
      3L -> (1 to 30).map(i => s"u$i").mkString(" ")))
    val got = SparkEntry.queries("dedup_substring_stats")(spark, dir)
      .select($"band", $"n_spans", $"dup_tokens", $"n_docs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // one 60-token span in each of docs 1 and 2 -> band 32 (32 <= 60 < 64)
    assert(got == Seq((32L, 2L, 120L, 2L)), s"got $got")
  }

  test("dedup_substring_incremental: leaves no cached partitions behind (r11 verdict #2)") {
    spark.catalog.clearCache()
    val got = q("dedup_substring_incremental").collect()
    assert(got.nonEmpty, "sf0.001 should flag store-known spans")
    assert(spark.sharedState.cacheManager.isEmpty,
      "the incremental span query must not leak persisted blocks")
  }

  test("dedup_substring_clean: duplicated ranges are cut from every occurrence, context survives verbatim") {
    val run = (1 to 60).map(i => s"dup$i").mkString(" ")
    val pre = (1 to 5).map(i => s"a$i").mkString(" ")
    val post = (1 to 9).map(i => s"b$i").mkString(" ")
    val other = (1 to 3).map(i => s"c$i").mkString(" ") + " " + run
    val solo = (1 to 30).map(i => s"u$i").mkString(" ")
    val dir = docsFixture(Seq(
      1L -> s"$pre $run $post",
      2L -> other,
      3L -> solo))
    val got = SparkEntry.queries("dedup_substring_clean")(spark, dir)
      .select($"doc_id", $"n_tok", $"removed_tok", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 74L, 60L, s"$pre $post")),
      s"doc 1 must keep exactly its unique context, got ${got(1L)}")
    assert(got(2L) == ((2L, 63L, 60L, (1 to 3).map(i => s"c$i").mkString(" "))),
      "the run is cut from BOTH occurrences (the released ExactSubstr behavior)")
    assert(got(3L) == ((3L, 30L, 0L, solo)), "a unique doc passes through verbatim")
  }

  test("contamination_spans: a leaked benchmark passage is localized; corpus-internal duplication is NOT flagged") {
    val leak = (1 to 20).map(i => s"leak$i").mkString(" ")   // in bench doc 1
    val inner = (1 to 12).map(i => s"inn$i").mkString(" ")   // shared by 60/61 only
    val dir = docsFixture(Seq(
      1L -> s"${(1 to 4).map(i => s"q$i").mkString(" ")} $leak", // benchmark slice
      60L -> s"${(1 to 6).map(i => s"x$i").mkString(" ")} $leak ${(1 to 5).map(i => s"y$i").mkString(" ")}",
      61L -> s"$inner ${(1 to 10).map(i => s"z$i").mkString(" ")}",
      62L -> s"${(1 to 9).map(i => s"w$i").mkString(" ")} $inner"))
    val got = SparkEntry.queries("contamination_spans")(spark, dir)
      .select($"doc_id", $"span_start", $"span_end", $"span_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only doc 60 leaks: the 20-token passage at offset 6, exactly
    assert(got == Seq((60L, 6L, 26L, 20L)),
      s"expected the leak localized in doc 60 only, got $got")
  }

  test("dedup_substring_incremental: only store-known ranges are flagged in new docs; new-new duplication is not") {
    val known = (1 to 15).map(i => s"kn$i").mkString(" ")   // in store doc 2
    val fresh = (1 to 12).map(i => s"fr$i").mkString(" ")   // shared by NEW docs 1 and 3 only
    val dir = docsFixture(Seq(
      2L -> s"${(1 to 5).map(i => s"s$i").mkString(" ")} $known",          // store (even)
      1L -> s"${(1 to 4).map(i => s"a$i").mkString(" ")} $known $fresh",   // new (odd)
      3L -> s"$fresh ${(1 to 9).map(i => s"b$i").mkString(" ")}",          // new (odd)
      4L -> (1 to 20).map(i => s"u$i").mkString(" ")))                     // store, unique
    val got = SparkEntry.queries("dedup_substring_incremental")(spark, dir)
      .select($"doc_id", $"span_start", $"span_end", $"span_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: the known 15-token run at offset 4, exactly; the fresh run
    // (shared only between the two NEW docs) must NOT be flagged
    assert(got == Seq((1L, 4L, 19L, 15L)),
      s"expected only the store-known span in doc 1, got $got")
  }

  test("text_lm_quality: common bigrams raise common_frac; min_p is a valid probability") {
    // "the cat" appears in three docs (corpus count >= 3); doc 4 is all
    // singleton bigrams
    val dir = docsFixture(Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat ran fast",
      3L -> "see the cat go",
      4L -> "unique words never repeat anywhere else"))
    val out = SparkEntry.queries("text_lm_quality")(spark, dir)
      .select($"doc_id", $"common_frac", $"min_p")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out.forall { case (_, cf, mp) =>
      cf >= 0.0 && cf <= 1.0 && mp > 0.0 && mp <= 1.0
    })
    assert(out(0)._2 > 0.0, "doc 1 contains the corpus-common bigram 'the cat'")
    assert(out(3)._2 == 0.0, "doc 4 has no corpus-common bigram")
  }

  test("select_token_budget: per-source budget respected, quality-first order") {
    val rows = q("select_token_budget")
      .select($"source", $"score", $"cum_tok")
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, sel) =>
      assert(sel.map(_._3).max <= 800L, s"$src exceeded the token budget")
      val scoresInCumOrder = sel.sortBy(_._3).map(_._2)
      assert(scoresInCumOrder.zip(scoresInCumOrder.tail).forall { case (a, b) => a >= b },
        s"$src selection is not quality-first")
    }
  }

  test("mix_weighted: target fractions come from the source group, kept <= total") {
    val rows = q("mix_weighted")
      .select($"source", $"target_frac", $"n_total", $"n_kept")
      .as[(String, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    val valid = Set(0.5, 0.25, 0.125, 0.0625)
    rows.foreach { case (src, tf, total, kept) =>
      assert(valid.contains(tf), s"$src target $tf")
      val grp = src.drop(3).toInt % 4
      assert(tf == Seq(0.5, 0.25, 0.125, 0.0625)(grp), s"$src wrong group weight")
      assert(kept <= total)
    }
  }

  test("text_gopher_rules: a clean English doc passes; each gate fails for the right reason") {
    val goodBody = ("the quick brown fox jumps over that lazy dog and " +
      "every word here will have sensible length with plenty more words ") * 3
    val dir = docsFixture(Seq(
      1L -> goodBody.trim,                                // passes all gates
      2L -> "too few words to pass the minimum",          // n_words < 50
      3L -> (("#### ... #### ... " * 20) + goodBody).trim // symbol_frac > 0.1
    ))
    val out = SparkEntry.queries("text_gopher_rules")(spark, dir)
      .select($"doc_id", $"n_words", $"symbol_frac", $"n_stop", $"pass")
      .as[(Long, Long, Double, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0)._5, s"doc 1 should pass: ${out(0)}")
    assert(!out(1)._5 && out(1)._2 < 50, "doc 2 fails on word count")
    assert(!out(2)._5 && out(2)._3 > 0.1, "doc 3 fails on symbol ratio")
    assert(out(0)._4 >= 2, "doc 1 has >= 2 canonical stopwords")
  }

  test("export_shards: every document lands in exactly one shard, ids bounded") {
    val out = q("export_shards")
      .select($"shard", $"n_docs", $"min_id", $"max_id", $"file")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => r._1 >= 0 && r._1 < 16))
    assert(out.forall(r => r._3 <= r._4))
    assert(out.forall(r => r._5 == f"shard-${r._1}%05d.parquet"))
    val totalDocs = out.map(_._2).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
  }

  test("quality_classifier: score matches the scalar md5 weight-table reference") {
    def md5hex(s: String): String =
      graft.functions.Digests.md5.get().digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def refScore(text: String): Long =
      text.split(" ", -1).map { t =>
        val bucket = java.lang.Long.parseLong(md5hex(t).substring(0, 3), 16)
        java.lang.Long.parseLong(md5hex(s"w|$bucket").substring(0, 2), 16) % 17 - 8
      }.sum
    val dir = docsFixture(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "lorem ipsum dolor sit amet"),
      (3L, "a")))
    val out = SparkEntry.queries("quality_classifier")(spark, dir)
      .select($"doc_id", $"n_tokens", $"score", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 9L, refScore("the quick brown fox jumps over the lazy dog"),
      refScore("the quick brown fox jumps over the lazy dog") > 0)))
    assert(out(1)._3 == refScore("lorem ipsum dolor sit amet"))
    assert(out(2)._3 == refScore("a"))
  }

  test("chunk_windows: stride-96 windows tile every document, last one truncated") {
    val twoHundred = (1 to 200).map(i => s"t$i").mkString(" ")
    val dir = docsFixture(Seq((1L, twoHundred), (2L, "only three tokens")))
    val out = SparkEntry.queries("chunk_windows")(spark, dir)
      .select($"doc_id", $"win_id", $"start_tok", $"win_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 0L, 128L), (1L, 1L, 96L, 104L), (1L, 2L, 192L, 8L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L)))
    // tiling: every token index is covered by >= 1 window
    val covered = out.filter(_._1 == 1L)
      .flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0L until 200L).toSet)
  }

  test("select_prototypes: the medoid is the tight-cluster member, not the straggler") {
    // label 0: three aligned vectors and one anti-aligned — a member of
    // the aligned triple must win; the straggler cannot.
    val dir = tmpDir("proto")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    Seq(
      (1L, v(1.0f), 0), (2L, v(0.98f, 0.2f), 0), (3L, v(0.99f, -0.1f), 0),
      (4L, v(-1.0f), 0),
      (10L, v(0.0f, 1.0f), 1), (11L, v(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("select_prototypes")(spark, dir)
      .select($"label", $"prototype_id", $"class_size")
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(Set(1L, 2L, 3L).contains(out(0)._1),
      s"label 0 prototype must come from the aligned triple, got ${out(0)}")
    assert(out(0)._2 == 4L && out(1)._2 == 2L)
    assert(Set(10L, 11L).contains(out(1)._1))
  }

  test("text_ngram_novelty: first arrival scores 1, verbatim re-crawl scores 0") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsFixture(Seq(
      1L -> a,                                       // all grams first-seen
      2L -> a,                                       // verbatim duplicate
      3L -> "alpha beta gamma kappa lambda mu nu"))  // partial overlap
    val out = SparkEntry.queries("text_ngram_novelty")(spark, dir)
      .select($"doc_id", $"novelty").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0, "the first document is all novel")
    assert(out(2L) == 0.0, "a verbatim re-crawl contributes nothing")
    assert(out(3L) > 0.0 && out(3L) < 1.0, "partial overlap lands in between")
  }

  test("f3_phrase_search: space-bounded non-overlapping occurrence semantics") {
    val dir = docsFixture(Seq(
      1L -> "x key agg y key agg z",   // 2 bounded occurrences
      2L -> "key agg key agg",         // adjacent: only the first is space-bounded
      3L -> "key nothing agg here",    // tokens present, phrase absent
      4L -> "prefix key agg"))         // 1 occurrence at the end
    val out = SparkEntry.queries("f3_phrase_search")(spark, dir)
      .select($"doc_id", $"n_occur").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 4L -> 1L),
      s"phrase counts mismatch: $out")
  }

  test("report_contamination_matrix: contaminated totals reconcile with text_contamination") {
    val matrix = SparkEntry.queries("report_contamination_matrix")(spark, sf)
      .select($"n_docs_contaminated").as[Long].collect().sum
    val perDoc = SparkEntry.queries("text_contamination")(spark, sf).count()
    assert(matrix == perDoc,
      s"per-source contaminated sum ($matrix) must equal the per-doc gate rows ($perDoc)")
  }

  test("dedup_cluster_cohesion: edges bounded by the complete graph, jaccards above the verify threshold") {
    val rows = SparkEntry.queries("dedup_cluster_cohesion")(spark, sf)
      .select($"n_members", $"n_edges", $"min_jac", $"max_jac", $"density")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, e, lo, hi, d) =>
      assert(n >= 2, "clusters are non-trivial by construction")
      assert(e >= n - 1, "a connected component has at least a spanning tree")
      assert(e <= n * (n - 1) / 2, "edges bounded by the complete graph")
      assert(lo >= 0.8 && hi <= 1.0 && lo <= hi, "verified-edge jaccard range")
      assert(d > 0.0 && d <= 1.0, s"density $d out of range")
    }
  }

  test("dedup_lsh_tuning: candidate count shrinks and precision rises as rows-per-band grow") {
    val rows = SparkEntry.queries("dedup_lsh_tuning")(spark, sf)
      .select($"n_bands", $"n_candidates", $"n_verified", $"precision")
      .as[(Long, Long, Long, Double)].collect().sortBy(-_._1)
    assert(rows.map(_._1).toSeq == Seq(4L, 2L, 1L))
    rows.foreach { case (_, nc, nv, p) =>
      assert(nv <= nc, "verified pairs are a subset of candidates")
      assert(p >= 0.0 && p <= 1.0)
      if (nc > 0) assert(math.abs(p - nv.toDouble / nc.toDouble) < 1e-15)
    }
    // banding theory: fewer, longer bands can only shrink the candidate
    // set (a full-band match at r=4 implies matches at every split)
    val nc = rows.map(_._2)
    assert(nc(0) >= nc(1) && nc(1) >= nc(2), s"candidates must shrink: ${nc.toSeq}")
    val prec = rows.filter(_._2 > 0).map(_._4)
    assert(prec.sameElements(prec.sorted),
      s"precision must not fall as bands lengthen: ${prec.toSeq}")
  }

  test("dedup_containment: doc-inside-doc inclusion scores 1.0 where Jaccard dilutes below threshold") {
    // B wraps A's full text in 3x more boilerplate: containment(A,B) = 1.0
    // but Jaccard ~ 1/4 — the asymmetric measure catches what the
    // symmetric one is designed to miss.
    val inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wrap = (1 to 60).map(i => s"pad$i").mkString(" ")
    val dir = docsFixture(Seq(
      1L -> inner,
      2L -> s"$wrap $inner",
      3L -> "completely different content with no overlap at all"))
    val out = SparkEntry.queries("dedup_containment")(spark, dir)
      .select($"a_id", $"b_id", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(1L -> 2L),
      s"exactly the inclusion pair flags, got ${out.toSeq}")
    assert(out.head._3 == 1.0, "full inclusion => containment exactly 1.0")
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(!jac.contains(1L -> 2L),
      "the Jaccard query at its threshold must miss this inclusion pair")
  }

  test("dedup_containment: a boilerplate shingle every doc shares generates no candidate pairs") {
    // 40 docs, each = the SAME boilerplate bigram + its own disjoint
    // content. The raw co-occurrence join would emit all 780 pairs as
    // candidates off the hot shingle alone; the rarest-first prefix probe
    // sorts the hot shingle last (df = 40) so it enters no prefix, and
    // the only candidates left are the planted inclusion pair's.
    val n = 40
    val boiler = "subscribe now"
    val inner = "alpha beta gamma delta epsilon zeta"
    val rows = (1L to n.toLong).map { i =>
      if (i == 1L) i -> s"$boiler $inner"
      else if (i == 2L) i -> s"$boiler pad${i}a pad${i}b pad${i}c pad${i}d $inner"
      else i -> s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
    }
    val dir = docsFixture(rows)
    val docs = graft.queries.TextOpsQueries.containmentShingled(spark, dir)
    val cand = graft.queries.TextOpsQueries.containmentCandidates(docs)
      .as[(Long, Long)].collect().toSet
    assert(cand.size < n,
      s"hot shingle must not explode candidates: ${cand.size} vs O(n^2) = ${n * (n - 1) / 2}")
    assert(cand.contains(1L -> 2L), "the real inclusion pair must survive the prefix filter")
    // end-to-end: the verified output is exactly the planted pair —
    // identical to what the unfiltered brute-force semantics produce
    val out = SparkEntry.queries("dedup_containment")(spark, dir)
      .select($"a_id", $"b_id", $"containment").as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(1L -> 2L), s"got ${out.toSeq}")
  }

  test("ann_filtered_knn: equals brute-force top-10 within the query's label class") {
    val all = Tables.embeddings(spark, sf)
      .filter($"embedding".isNotNull)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val (qv, qLabel) = all.find(_._1 == 0L).map(r => (r._3, r._2)).get
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until n).foreach { i => d += a(i).toDouble * b(i).toDouble }
      a.foreach(x => na += x.toDouble * x.toDouble)
      b.foreach(x => nb += x.toDouble * x.toDouble)
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = all.filter(r => r._1 != 0L && r._2 == qLabel)
      .map(r => (r._1, cos(r._3, qv)))
      .sortBy { case (id, sim) => (-sim, id) }.take(10).map(_._1).toSeq
    val got = SparkEntry.queries("ann_filtered_knn")(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect()
    assert(got.forall(_._2 == qLabel), "every hit shares the query's label")
    assert(got.map(_._1).toSeq == expect, "filtered scan == brute force within class")
  }

  test("d5_mmr: diversity pick skips the near-duplicate hit a plain top-k stacks") {
    // Query q = +e1. a1/a2 are near-identical high-relevance hits; b is
    // slightly less relevant but diverse. Plain top-2 = {a1, a2}; MMR at
    // λ=0.7 must swap the duplicate a2 for b at rank 2.
    val dir = tmpDir("mmr")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    Seq(
      (0L, v(1.0f), 0),                    // query vector = +e1
      (1L, v(0.92f, 0.39f), 0),            // a1: top relevance (~0.921)
      (2L, v(0.91f, 0.41f), 0),            // a2: a1's near-duplicate (~0.912)
      (3L, v(0.90f, -0.43f), 0),           // b: similar relevance, OPPOSITE e2 side
      (4L, v(0.0f, 0.0f, 1.0f), 1))        // far-off filler
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mmr = SparkEntry.queries("d5_mmr")(spark, dir)
      .select($"rank", $"vec_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(mmr.take(2).map(_._2).toSeq == Seq(1L, 3L),
      s"MMR must pick the diverse b over the duplicate a2, got ${mmr.toSeq}")
    // exactness twin on the same fixture: λ=1 == plain cosine order
    val exact = SparkEntry.queries("d5_mmr_exact")(spark, dir)
      .select($"rank", $"vec_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(exact.take(3).map(_._2).toSeq == Seq(1L, 2L, 3L),
      s"λ=1 must reproduce the plain top-k order, got ${exact.toSeq}")
  }

  test("rank_bm25: rare-term matches outrank common-term matches; no-match docs score zero") {
    // Query terms are the fixed ("spark", "join", "window"). "spark" is in
    // 8 of 10 docs (common), "join" in exactly one (rare): BM25's idf must
    // rank the rare-term doc above any single-common-term doc.
    val dir = docsFixture(
      (1L to 8L).map(i => i -> s"spark filler$i more words here") ++ Seq(
        9L -> "join alpha beta gamma delta",
        10L -> "nothing relevant at all here"))
    val out = SparkEntry.queries("rank_bm25")(spark, dir)
      .select($"doc_id", $"score").as[(Long, Double)].collect()
    val score = out.toMap
    assert(score(9L) > score(1L), "rare 'join' doc must outrank a common 'spark' doc")
    val zeroDoc = out.find(_._1 == 10L)
    assert(zeroDoc.forall(_._2 == 0.0), "no-match doc scores zero if present")
    assert(out.sortBy(-_._2).head._1 == 9L, "rare-term doc is rank 1")
    // scores are sorted desc by construction
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-(_: Double)).toSeq)
  }

  test("report_gate_matrix: counts match gate flags recomputed from text_gopher_rules") {
    val goodBody = ("the quick brown fox jumps over that lazy dog and " +
      "every word here will have sensible length with plenty more words ") * 3
    val dir = docsFixture(Seq(
      1L -> goodBody.trim,                                 // passes all gates
      2L -> "too few words to pass the minimum",           // words only
      3L -> (("#### ... #### ... " * 20) + goodBody).trim, // symbol (+ maybe alpha)
      4L -> "zz qq ww"))                                   // words, word_len, stopword
    // Re-derive each doc's failed-gate set from the gopher metrics the
    // sibling query emits — the matrix must be exactly the pair counts of
    // those sets (diagonal = single-gate failures).
    val flags = SparkEntry.queries("text_gopher_rules")(spark, dir)
      .select($"doc_id", $"n_words", $"mean_word_len", $"symbol_frac",
        $"alpha_frac", $"n_stop")
      .as[(Long, Long, Double, Double, Double, Long)].collect()
      .map { case (_, nw, mwl, sf_, af, ns) =>
        Seq(
          if (!(nw >= 50 && nw <= 100000)) Some("words") else None,
          if (!(mwl >= 3.0 && mwl <= 10.0)) Some("word_len") else None,
          if (sf_ > 0.1) Some("symbol") else None,
          if (af < 0.8) Some("alpha") else None,
          if (ns < 2) Some("stopword") else None).flatten
      }
    val expected = flags.flatMap(fs =>
      for (a <- fs; b <- fs if a <= b) yield (a, b))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("report_gate_matrix")(spark, dir)
      .select($"gate_a", $"gate_b", $"n_docs")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected, s"matrix mismatch: got $got expected $expected")
    // structural sanity: co-failures never exceed either single-gate count
    got.foreach { case ((a, b), n) =>
      if (a != b)
        assert(n <= math.min(got.getOrElse((a, a), 0L), got.getOrElse((b, b), 0L)))
    }
    assert(got.exists { case ((a, b), _) => a != b }, "fixture must co-fail gates")
  }

  /** docsFixture with a per-row language (for the fertility audit). */
  private def langDocsFixture(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("traindata")
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_paragraph: repeated 16-token tiles are removed except the first occurrence, docs reassemble in order") {
    def tile(p: String) = (1 to 16).map(i => s"$p$i").mkString(" ")
    val (a, b, c) = (tile("a"), tile("b"), tile("c"))
    // doc1 = A B; doc2 = A C (A duplicates doc1's); doc3 = A B (full copy)
    val dir = docsFixture(Seq(
      (1L, s"$a $b"), (2L, s"$a $c"), (3L, s"$a $b")))
    val rows = SparkEntry.queries("dedup_paragraph")(spark, dir)
      .select($"doc_id", $"n_tiles", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, 2L, 0L, s"$a $b")), "first occurrences all kept")
    assert(rows(2L) == ((2L, 2L, 1L, c)), "doc2 loses the shared tile A")
    assert(rows(3L) == ((3L, 2L, 2L, "")), "a full copy reassembles to empty")
  }

  test("dedup_winnowing: a shared >= w+k-1 token run is guaranteed detected; pairs match a scalar reference") {
    // k=4, w=4: any shared run of >= 7 tokens must yield a shared fingerprint
    val run = (1 to 7).map(i => s"run$i").mkString(" ")
    val pad = (off: Int, n: Int) => (0 until n).map(i => s"x${off + i}").mkString(" ")
    val dir = docsFixture(Seq(
      (1L, s"${pad(0, 9)} $run ${pad(100, 6)}"),
      (2L, s"${pad(200, 4)} $run ${pad(300, 11)}"),
      (3L, pad(400, 20))))
    val got = SparkEntry.queries("dedup_winnowing")(spark, dir)
      .select($"d1", $"d2", $"shared", $"sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.exists(r => r._1 == 1L && r._2 == 2L && r._3 >= 1L),
      s"the 7-token shared run must be fingerprint-detected, got ${got.toSeq}")
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L),
      "the disjoint doc shares nothing")

    // scalar reference winnowing (same hash, same leftmost-min selection)
    def fps(text: String): Set[Long] = {
      val toks = text.split(" ")
      val grams =
        if (toks.length <= 4) Seq(toks.mkString(" "))
        else toks.sliding(4).map(_.mkString(" ")).toSeq
      val packed = grams.zipWithIndex.map { case (g, p) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16) * 1048576L + p
      }
      if (packed.length < 4) Set.empty
      else packed.sliding(4).map(_.min).map(_ / 1048576L).toSet
    }
    val texts = Map(
      1L -> s"${pad(0, 9)} $run ${pad(100, 6)}",
      2L -> s"${pad(200, 4)} $run ${pad(300, 11)}",
      3L -> pad(400, 20))
    val expected = (for {
      d1 <- texts.keys; d2 <- texts.keys if d1 < d2
      sharedH = fps(texts(d1)).intersect(fps(texts(d2))) if sharedH.nonEmpty
    } yield (d1, d2, sharedH.size.toLong,
      sharedH.size.toDouble / math.min(fps(texts(d1)).size, fps(texts(d2)).size)))
      .toSet
    assert(got.toSet == expected,
      s"query pairs ${got.toSeq} != scalar reference $expected")
  }

  test("dedup_winnowing: a corpus-wide hot fingerprint (df > 64) is capped out of pair generation") {
    // 70 docs carry the same 16-token boilerplate text, so every
    // boilerplate fingerprint has df = 70 > 64 and is capped out of the
    // pair join — without the cap this fixture alone generates 70*69/2
    // candidate pairs. Docs 1-2 append a PRIVATE 7-token run whose
    // fully-private windows (window p=16 covers only private grams)
    // produce a df=2 fingerprint deterministically, so exactly the pair
    // (1,2) must survive
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val priv = (1 to 7).map(i => s"p$i").mkString(" ")
    val docs = (1L to 70L).map { id =>
      (id, if (id <= 2L) s"$boiler $priv" else boiler)
    }
    val dir = docsFixture(docs)
    val got = SparkEntry.queries("dedup_winnowing")(spark, dir)
      .select($"d1", $"d2", $"shared").as[(Long, Long, Long)].collect()
    assert(got.exists(r => r._1 == 1L && r._2 == 2L),
      s"the private shared run must still pair docs 1-2, got ${got.toSeq}")
    // every reported pair must involve the privately-shared docs: the
    // boilerplate fingerprint alone (df=70 > cap) pairs nothing
    assert(got.forall(r => r._1 <= 2L && r._2 <= 2L),
      s"capped boilerplate generated pairs: ${got.toSeq}")
  }

  test("dedup_cdc_chunks: content-defined boundaries survive a token insertion that shifts fixed tiles") {
    def h32(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    // a token that IS a chunk boundary (md5 % 8 == 0), placed before the
    // shared suffix so everything after it chunks identically in both docs
    val anchor = (1 to 1000).map(i => s"w$i").find(t => h32(t) % 8 == 0).get
    val suffix = (1 to 12).map(i => s"s$i").mkString(" ")
    val d1 = s"a1 a2 a3 a4 a5 $anchor $suffix"
    val d2 = s"b1 b2 b3 b4 b5 b6 $anchor $suffix" // prefix one token longer
    val d3 = (1 to 20).map(i => s"z$i").mkString(" ")
    val dir = docsFixture(Seq((1L, d1), (2L, d2), (3L, d3)))
    val rows = SparkEntry.queries("dedup_cdc_chunks")(spark, dir)
      .select($"doc_id", $"n_chunks", $"n_shared")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._3 >= 1L && rows(2L)._3 >= 1L,
      s"suffix chunks after the content-defined cut must be shared: $rows")
    assert(rows(3L)._3 == 0L, "the disjoint doc shares nothing")

    // scalar reference chunker pins the chunking itself
    def chunksOf(text: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur: String = null
      text.split(" ").foreach { t =>
        cur = if (cur == null) t else s"$cur $t"
        if (h32(t) % 8 == 0) { out += cur; cur = null }
      }
      if (cur != null) out += cur
      out.toSeq
    }
    assert(rows(1L)._2 == chunksOf(d1).length.toLong, "chunk count == scalar fold")
    assert(chunksOf(d1).toSet.intersect(chunksOf(d2).toSet).nonEmpty)
    // the fixed 16-token tiles all shift past the inserted token: the
    // tile query sees NO duplication on the same fixture
    val tiles = SparkEntry.queries("dedup_paragraph")(spark, dir)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect()
    assert(tiles.forall(_._2 == 0L),
      "16-token tiles shifted by the insertion must detect nothing")
  }

  test("select_kcenter: farthest-point traversal picks the antipode first, then one per orthogonal axis") {
    val dir = tmpDir("kcenter")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    // seed = min id (1). Farthest from it: the antipode 6 (dist 2).
    // Then the orthogonal axes all sit at dist 1 — ids break the ties.
    Seq((1L, v(1.0f), 0), (2L, v(0.9f, 0.1f), 0), (3L, v(0.0f, 1.0f), 0),
      (4L, v(0.0f, 0.0f, 1.0f), 0), (5L, v(0.0f, 0.0f, 0.0f, 1.0f), 0),
      (6L, v(-1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("select_kcenter")(spark, dir)
      .select($"step", $"vec_id", $"radius")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq((0L, 1L), (1L, 6L), (2L, 3L), (3L, 4L), (4L, 5L)), got.toString)
    assert(got.head._3.isEmpty)
    assert(got(1)._3.contains(2.0) &&
      got.drop(2).forall(_._3.contains(1.0)), got.toString)
  }

  test("text_code_detect: code fixture routes as code, prose does not; counts are exact") {
    val code = "def foo(x) { return x; }"
    val prose = "the cat sat on the mat"
    val dir = docsFixture(Seq((1L, code), (2L, prose)))
    val rows = SparkEntry.queries("text_code_detect")(spark, dir)
      .select($"doc_id", $"n_sym", $"kw_hits", $"is_code")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // symbols in the code doc: ( ) { ; } — five; keywords: def, return
    assert(rows(1L)._2 == 5L && rows(1L)._3 == 2L && rows(1L)._4,
      rows(1L).toString)
    assert(rows(2L)._2 == 0L && rows(2L)._3 == 0L && !rows(2L)._4,
      rows(2L).toString)
  }

  test("mine_hard_negatives: band excludes near-dups and easy negatives; survivors rank hardest-first") {
    val dir = tmpDir("hardneg")
    def v(xs: Float*): Array[Float] = xs.toArray.padTo(4, 0.0f)
    // anchor 0 along x; 10 = exact dup (sim 1.0, above band), 11 at 0.6,
    // 12 at ~0.5, 13 orthogonal (0.0, below band)
    Seq((0L, v(1.0f), 0), (10L, v(1.0f), 0), (11L, v(0.6f, 0.8f), 0),
      (12L, v(0.5f, 0.866f), 0), (13L, v(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("mine_hard_negatives")(spark, dir)
      .select($"q_id", $"vec_id", $"sim").as[(Long, Long, Double)].collect()
    val forAnchor = rows.filter(_._1 == 0L).map(_._2).toSeq
    assert(forAnchor == Seq(11L, 12L),
      s"band must keep exactly the two mid-similarity vectors, hardest first: $forAnchor")
    rows.foreach { case (_, _, sim) =>
      assert(sim >= 0.35 && sim < 0.75, s"out-of-band sim $sim")
    }
  }

  test("pack_bins_nosplit: FFD assignment matches a scalar fold; bins respect capacity; oversize docs get singleton bins") {
    val C = 256
    // doc_ids all ≡ 0 (mod 8) so every document lands in ONE shard and
    // the first-fit interplay is actually exercised
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val lens = Seq(0L -> 200, 8L -> 150, 16L -> 100, 24L -> 56, 32L -> 300)
    val dir = docsFixture(lens.map { case (id, n) => (id, words(n)) })
    val got = SparkEntry.queries("pack_bins_nosplit")(spark, dir)
      .select($"doc_id", $"n_tok", $"bin_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // scalar first-fit-decreasing reference (n_tok desc, doc_id asc)
    val order = lens.sortBy { case (id, n) => (-n, id) }
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ref = order.map { case (id, n) =>
      val fit = loads.indexWhere(_ + n <= C)
      val bid = if (fit < 0) { loads += n.toLong; loads.length } else {
        loads(fit) += n; fit + 1
      }
      id -> bid.toLong
    }.toMap
    lens.foreach { case (id, n) =>
      assert(got(id) == ((n.toLong, ref(id))),
        s"doc $id: got ${got(id)}, want n_tok=$n bin=${ref(id)}")
    }
    // capacity: every multi-doc bin sums <= C; the 300-token doc is alone
    val byBin = got.toSeq.groupBy(_._2._2)
    byBin.foreach { case (bid, ms) =>
      val tot = ms.map(_._2._1).sum
      assert(tot <= C || ms.length == 1, s"bin $bid over capacity: $ms")
    }
    assert(byBin(got(32L)._2).length == 1, "oversize doc must sit alone")
  }

  test("pack_efficiency_report: pad accounting matches the FFD loads and the concat ceiling") {
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // one shard (ids ≡ 0 mod 8); FFD loads: [300], [200+56], [150+100]
    val dir = docsFixture(Seq(0L -> words(200), 8L -> words(150),
      16L -> words(100), 24L -> words(56), 32L -> words(300)))
    val r = SparkEntry.queries("pack_efficiency_report")(spark, dir)
      .select($"shard", $"n_docs", $"tot_tok", $"concat_seqs",
        $"pad_concat", $"ffd_bins", $"pad_ffd")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 1)
    val (_, nDocs, tot, seqs, padC, bins, padF) = r.head
    assert(nDocs == 5L && tot == 806L)
    assert(seqs == 4L && padC == 4 * 256 - 806)       // concat-split ceiling
    assert(bins == 3L && padF == 0 + 0 + 6,           // 300 clamps to 0
      s"ffd bins $bins pad $padF")
  }

  test("samp4_pps_systematic: interval-crossing selection; per-shard count == tot div stride; oversize always taken") {
    def chars(n: Int) = "x" * n // n_chars == text length in docsFixture
    // shard 0 cums: 500, 900, 2400, 2500 → only the 1500-char doc crosses
    val dir = docsFixture(Seq(0L -> chars(500), 8L -> chars(400),
      16L -> chars(1500), 24L -> chars(100)))
    val got = SparkEntry.queries("samp4_pps_systematic")(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(16L), s"expected only the oversize doc: $got")

    // exact-count invariant on the real corpus: the intervals partition
    // (0, tot], so each shard selects exactly tot div 1000 documents
    val counts = q("samp4_pps_systematic")
      .groupBy($"shard").agg(count(lit(1)).as("n"))
    val tots = Tables.documents(spark, sf)
      .groupBy(($"doc_id" % 8).as("shard")).agg(sum($"n_chars").as("tot"))
    val sel = tots.join(counts, Seq("shard"), "left")
      .select(coalesce($"n", lit(0L)), $"tot").as[(Long, Long)].collect()
    assert(sel.nonEmpty)
    sel.foreach { case (n, tot) =>
      assert(n == tot / 1000L, s"selected $n, tot $tot")
    }
  }

  test("text_readability: sentence/syllable counts and both scores match the scalar formulas") {
    val d1 = "the cat sat. it ran! why?" // 6 words, 3 sentences, 6 syllables
    val d2 = "7 km"                      // vowel-less words still carry 1 syllable each
    val dir = docsFixture(Seq((1L, d1), (2L, d2)))
    val rows = SparkEntry.queries("text_readability")(spark, dir)
      .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
        $"flesch_ease", $"fk_grade")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def scores(w: Long, s: Long, sy: Long): (Double, Double) = {
      val wps = w.toDouble / s.toDouble; val spw = sy.toDouble / w.toDouble
      (206.835 - 1.015 * wps - 84.6 * spw, 0.39 * wps + 11.8 * spw - 15.59)
    }
    assert(rows(1L)._2 == 6L && rows(1L)._3 == 3L && rows(1L)._4 == 6L, rows(1L).toString)
    assert(rows(2L)._2 == 2L && rows(2L)._3 == 1L && rows(2L)._4 == 2L, rows(2L).toString)
    val (f1, g1) = scores(6, 3, 6); val (f2, g2) = scores(2, 1, 2)
    assert(rows(1L)._5 == f1 && rows(1L)._6 == g1)
    assert(rows(2L)._5 == f2 && rows(2L)._6 == g2)
  }

  test("dedup_cdc_incremental: a re-ingested doc is fully seen, a novel doc fully unseen") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val fresh = (1 to 40).map(i => s"z$i").mkString(" ")
    // store half = even ids; doc 1 duplicates doc 0, doc 3 is disjoint
    val dir = docsFixture(Seq((0L, base), (1L, base), (3L, fresh)))
    val rows = SparkEntry.queries("dedup_cdc_incremental")(spark, dir)
      .select($"doc_id", $"n_chunks", $"n_seen", $"novel_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(1L, 3L), "only the odd (new) docs report")
    assert(rows(1L)._3 == rows(1L)._2 && rows(1L)._4 == 0.0, rows(1L).toString)
    assert(rows(3L)._3 == 0L && rows(3L)._4 == 1.0, rows(3L).toString)
  }

  test("samp5_pps_poisson: membership matches the scalar 40-bit rule; long docs always in with HT weight 1") {
    def h40(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 10), 16)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val want = docs.filter { case (id, w) =>
      h40(id) * 1000L < w * 1099511627776L
    }.map(_._1).toSet
    val got = q("samp5_pps_poisson")
      .select($"doc_id", $"w", $"ht_weight")
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == want)
    got.filter(_._2 >= 1000L).foreach { r =>
      assert(r._3 == 1.0, s"oversize doc must carry HT weight 1: $r")
    }
    assert(got.nonEmpty && want.nonEmpty)
  }

  test("bpe_fertility: per-language token/word/char ratios under the fixed merge table") {
    // en: "the"->the</w> (ranks 0,1), "and"->and</w> (ranks 3,4) — 1 token
    // per word; de: "or" is [o, r</w>] (the o+r merge needs a NON-final r)
    // — 2 tokens per word
    val dir = langDocsFixture(Seq(
      (1L, "the the and", "en"),
      (2L, "or or", "de")))
    val rows = SparkEntry.queries("bpe_fertility")(spark, dir)
      .select($"lang", $"n_docs", $"n_words", $"n_toks", $"n_chars",
        $"fertility", $"chars_per_tok")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("en") == (("en", 1L, 3L, 3L, 9L, 1.0, 3.0)))
    assert(rows("de") == (("de", 1L, 2L, 4L, 4L, 2.0, 1.0)))
  }
}
