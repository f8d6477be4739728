package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the AnalyticsQueries additions that have
  * non-obvious invariants beyond the DuckDB oracle:
  *  - salted aggregation / salted join must equal their unsalted twins;
  *  - the PPJoin positional+length filters must be lossless (same pairs
  *    as the unfiltered prefix join);
  *  - cube/grouping-sets lattice levels must be consistent with the
  *    base aggregate.
  */
class AnalyticsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("g10_attribution: first/last touch resolve per conversion; touchless conversions drop") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("attr")
    // user 1: view, click, then two purchases — first touch is always the
    // view, last touch is the click for both (no touch in between);
    // user 2: a purchase with no preceding touch — excluded
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 10:20:00"), 1L, "purchase"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("g10_attribution")(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("first_touch", "view", 2L), ("last_touch", "click", 2L)),
      got.toString)
  }

  test("report_sampling_design: per-design counts reconcile with the individual sampling queries") {
    import spark.implicits._
    val rep = SparkEntry.queries("report_sampling_design")(spark, sf)
      .select($"design", $"n_sampled", $"mass_frac")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rep.keySet ==
      Set("uniform_hash", "systematic_pps", "poisson_pps"))
    val sys4 = SparkEntry.queries("samp4_pps_systematic")(spark, sf).count()
    val poi5 = SparkEntry.queries("samp5_pps_poisson")(spark, sf).count()
    assert(rep("systematic_pps")._2 == sys4)
    assert(rep("poisson_pps")._2 == poi5)
    rep.values.foreach { case (_, n, mf) =>
      assert(n > 0 && mf > 0.0 && mf <= 1.0)
    }
  }

  test("salted two-stage aggregation equals plain groupBy") {
    val salted = SparkEntry.queries("skew_salted_agg")(spark, sf)
    val plain = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .orderBy(col("event_type"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join aggregate equals plain join aggregate") {
    val salted = SparkEntry.queries("e8_salted_join")(spark, sf)
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("c_mktsegment"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("ppjoin positional/length filters are lossless vs brute-force pairs") {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.HashedShinglesFunctions
          .hashedShingles(tokens(col("text")), 2).as("ts"))
    val a = docs.select(col("doc_id").as("a_id"), col("source"), col("ts").as("ta"))
    val b = docs.select(col("doc_id").as("b_id"), col("source"), col("ts").as("tb"))
    val brute = a.join(b, Seq("source"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.functions.ArrayFunctions.jaccardSorted(col("ta"), col("tb")).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("a_id"), col("b_id"))
      .collect().toSeq
    val pruned = SparkEntry.queries("dedup_ppjoin")(spark, sf).collect().toSeq
    assert(pruned == brute)
  }

  test("cube lattice is consistent: grand total row equals table count") {
    val cube = SparkEntry.queries("c11_cube")(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    val grand = cube.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    // level sums: every lattice level re-partitions the same row set
    Seq(0L, 1L, 2L).foreach { g =>
      assert(cube.filter(_.getAs[Long]("gid") == g)
        .map(_.getAs[Long]("n")).sum == total)
    }
  }

  test("grouping sets: per-status level matches direct groupBy") {
    val gs = SparkEntry.queries("c12_grouping_sets")(spark, sf).collect()
      .filter(_.getAs[Long]("gid") == 1L)
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n")).toMap
    val direct = Tables.orders(spark, sf).groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gs == direct)
  }

  test("window suite: rolling3 equals sum of current + two preceding prices") {
    val rows = SparkEntry.queries("w1_window_suite")(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "rolling3")
      .collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, g) =>
      // window frame order is (o_orderdate, o_orderkey), not output order
      val rs = g.sortBy(r =>
        (r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          r.getAs[Long]("o_orderkey")))
      val prices = rs.map(_.getAs[Double]("o_totalprice"))
      rs.zipWithIndex.foreach { case (r, i) =>
        val from = math.max(0, i - 2)
        val expect = prices.slice(from, i + 1)
          .map(p => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
        assert(math.abs(r.getAs[Double]("rolling3") - expect) < 1e-6)
      }
    }
  }

  test("ts2_ewma: per-user fold equals the scalar EWMA over the time-ordered values") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_id",
        date_trunc("second", $"ts").as("ts_sec"), $"value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val vals = es.sortBy(e => (e._3.getTime, e._2)).map(_._4)
      vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.75 + x * 0.25)
    }.toMap
    val got = SparkEntry.queries("ts2_ewma")(spark, sf)
      .select($"user_id", $"ewma").as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, e) =>
      assert(e == expected(u), s"user $u: ewma $e != scalar ${expected(u)}")
    }
  }

  test("g8_cohort_matrix: offset-0 retention is 1.0 and offset-1 matches g6_retention") {
    import spark.implicits._
    val m = SparkEntry.queries("g8_cohort_matrix")(spark, sf)
      .select($"cohort_week".cast("string"), $"week_offset", $"n_active",
        $"cohort_size", $"retention")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(m.nonEmpty)
    m.foreach { case (_, off, na, cs, r) =>
      assert(na <= cs && r <= 1.0 + 1e-12 && off >= 0)
    }
    m.filter(_._2 == 0L).foreach { case (w, _, na, cs, r) =>
      assert(na == cs && r == 1.0, s"cohort $w: every member is active in week 0")
    }
    val g6 = SparkEntry.queries("g6_retention")(spark, sf)
      .select($"cohort_week".cast("string"), $"retained_next_week")
      .as[(String, Long)].collect().toMap
    val off1 = m.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    g6.foreach { case (w, retained) =>
      assert(off1.getOrElse(w, 0L) == retained,
        s"cohort $w: matrix offset-1 must equal g6's retained_next_week")
    }
  }

  test("g9_interarrival: gap quantiles ordered, gap counts reconcile with event counts") {
    import spark.implicits._
    val out = SparkEntry.queries("g9_interarrival")(spark, sf)
      .select($"user_id", $"n_gaps", $"median_gap_s", $"p90_gap_s", $"max_gap_s")
      .as[(Long, Long, Double, Double, Long)].collect()
    val counts = Tables.events(spark, sf).groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (u, n, med, p90, mx) =>
      assert(n == counts(u) - 1, s"user $u: gaps = events - 1")
      assert(med <= p90 + 1e-9 && p90 <= mx + 1e-9, s"user $u: quantile order")
      assert(med >= 0.0)
    }
  }

  test("c14_quartiles_approx: sketch quartiles land within 1% of the exact ones") {
    import spark.implicits._
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .select($"o_orderstatus", $"q1", $"median", $"q3")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = rows("c14_quartiles")
    val approx = rows("c14_quartiles_approx")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e1, e2, e3)) =>
      val (a1, a2, a3) = approx(k)
      Seq((a1, e1), (a2, e2), (a3, e3)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.01 * math.abs(e),
          s"$k: approx $a vs exact $e beyond 1%")
      }
    }
  }

  test("c19_incremental_agg: base+delta merge equals the full recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("c19_incremental_agg")(spark, sf)
      .select($"event_type", $"n", $"sum_value",
        $"last_ts".cast("string"))
      .as[(String, Long, Double, String)].collect().sortBy(_._1)
    val full = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("sum_value"),
        date_trunc("second", max($"ts")).cast("string").as("last_ts"))
      .select($"event_type", $"n", $"sum_value", $"last_ts")
      .as[(String, Long, Double, String)].collect().sortBy(_._1)
    assert(got.toSeq == full.toSeq,
      "merging algebraic partials must equal recomputing from the full fact table")
  }

  test("a5_scd2: version ranges tile each user's timeline with exactly one open version") {
    import spark.implicits._
    val out = SparkEntry.queries("a5_scd2")(spark, sf)
      .select($"user_id", $"event_id", $"valid_from", $"valid_to")
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect()
    out.groupBy(_._1).foreach { case (u, versions) =>
      val sorted = versions.sortBy(v => (v._3.getTime, v._2))
      sorted.init.zip(sorted.tail).foreach { case (cur, nxt) =>
        assert(cur._4.contains(nxt._3),
          s"user $u: version ${cur._2} must close exactly where ${nxt._2} opens")
      }
      assert(sorted.last._4.isEmpty && sorted.init.forall(_._4.nonEmpty),
        s"user $u: exactly the last version is open")
    }
    // the AS OF reconstruction returns exactly one row per user seen by then
    val asof = SparkEntry.queries("a5_scd2_asof")(spark, sf)
      .select($"user_id").as[Long].collect()
    assert(asof.distinct.length == asof.length, "AS OF yields one version per user")
  }

  test("feat2_winsorize: clip counts bounded by the 5% tails, clipped mean inside the cuts") {
    import spark.implicits._
    val out = SparkEntry.queries("feat2_winsorize")(spark, sf)
      .select($"event_type", $"n_events", $"lo", $"hi",
        $"n_clip_lo", $"n_clip_hi", $"clipped_mean")
      .as[(String, Long, Double, Double, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, n, lo, hi, cl, ch, cm) =>
      assert(lo <= hi, s"$t: cuts ordered")
      assert(cl <= n * 0.05 + 1 && ch <= n * 0.05 + 1,
        s"$t: at most ~5% clipped per tail ($cl, $ch of $n)")
      assert(cm >= lo && cm <= hi, s"$t: clipped mean $cm inside [$lo, $hi]")
    }
  }

  test("feat3_standardize: audit row is the true max-|z| event of its type") {
    import spark.implicits._
    val out = SparkEntry.queries("feat3_standardize")(spark, sf)
      .select($"event_type", $"event_id", $"value", $"mean_v", $"sd", $"z")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val byType = Tables.events(spark, sf)
      .select($"event_type", $"event_id", $"value")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    assert(out.map(_._1).toSet == byType.keySet)
    out.foreach { case (t, id, v, mean, sd, z) =>
      val vals = byType(t).map(_._3)
      val n = vals.length.toDouble
      val bfMean = vals.sum / n
      assert(math.abs(mean - bfMean) < 1e-6, s"$t mean")
      assert(math.abs(z - (v - mean) / sd) < 1e-12, s"$t z consistency")
      val maxAbsZ = vals.map(x => math.abs((x - mean) / sd)).max
      assert(math.abs(math.abs(z) - maxAbsZ) < 1e-9,
        s"$t: reported event $id is not the extreme (|z|=${math.abs(z)} vs $maxAbsZ)")
    }
  }

  test("g7_markov: transition counts match the hand-traced streams; rows per 'from' sum to 1") {
    import spark.implicits._
    // user 1: a -> b -> a -> c ; user 2: a -> b. Transitions:
    // a->b (2), b->a (1), a->c (1). No cross-user transition may appear.
    val dir = tmpDir("markov")
    Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"), (4L, 1L, "c"),
      (5L, 2L, "a"), (6L, 2L, "b"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds($"event_id" + 1700000000L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("g7_markov")(spark, dir)
      .select($"event_type", $"next_type", $"n", $"p")
      .as[(String, String, Long, Double)].collect()
    val counts = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(counts == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))
    got.groupBy(_._1).foreach { case (from, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12,
        s"P(next | $from) must sum to 1")
    }
  }

  test("ts3_anomaly_mad: MAD gate is outlier-immune where the 3-sigma gate is not") {
    import spark.implicits._
    // 40 inliers around 10 plus two extreme outliers: the outliers inflate
    // sigma (q6's gate) but leave median/MAD untouched, so the MAD gate
    // must still flag exactly the two extremes.
    val dir = tmpDir("mad")
    val rows = ((1 to 40).map(i => (i.toLong, 1L, "a", 10.0 + (i % 5) * 0.1)) ++
      Seq((98L, 1L, "a", 5000.0), (99L, 1L, "a", -5000.0)))
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds($"event_id" + 1700000000L))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("ts3_anomaly_mad")(spark, dir)
      .select($"event_type", $"n_events", $"med", $"mad", $"n_anomalies")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(out.length == 1)
    val (_, n, med, mad, anom) = out.head
    assert(n == 42)
    assert(med >= 10.0 && med <= 10.5, s"median $med must sit in the inlier band")
    assert(mad <= 0.5, s"MAD $mad must ignore the extremes")
    assert(anom == 2, s"exactly the two planted extremes flagged, got $anom")
  }

  test("report_k_anonymity: class sizes conserve the table, a planted singleton is flagged at-risk") {
    import spark.implicits._
    // fixture: one singleton QI class (k=1, at risk) + one k=6 class
    val dir = tmpDir("kanon")
    Seq(
      (1L, "n1", 7, 10.0, "BUILDING"),
      (2L, "n2", 3, 10.0, "AUTOMOBILE"), (3L, "n3", 3, 10.0, "AUTOMOBILE"),
      (4L, "n4", 3, 10.0, "AUTOMOBILE"), (5L, "n5", 3, 10.0, "AUTOMOBILE"),
      (6L, "n6", 3, 10.0, "AUTOMOBILE"), (7L, "n7", 3, 10.0, "AUTOMOBILE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = SparkEntry.queries("report_k_anonymity")(spark, dir)
      .select($"c_nationkey", $"c_mktsegment", $"k", $"at_risk", $"share")
      .as[(Int, String, Long, Boolean, Double)].collect()
    assert(rows.map(_._3).sum == 7L, "class sizes conserve the table")
    assert(rows.forall(r => r._4 == (r._3 < 5L)), "at_risk == (k < 5)")
    val singleton = rows.find(r => r._1 == 7 && r._2 == "BUILDING").get
    assert(singleton._3 == 1L && singleton._4, "planted singleton is at risk")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12, "shares sum to 1")
    assert(rows.sortBy(r => (r._3, r._1, r._2)).toSeq == rows.toSeq,
      "output ordered by (k, nation, segment)")
  }
}
