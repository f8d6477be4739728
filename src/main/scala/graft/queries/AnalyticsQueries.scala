package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deeper OLAP surface beyond the reference's own queries: multi-level
  * aggregation lattices (cube / grouping sets), classic multi-way join
  * analytics (TPC-H Q3/Q5 shapes over the synthetic tables), a ranking /
  * framed-window suite, exact-arithmetic dispersion statistics, skew-safe
  * salted aggregation/join (the 100 TB posture of operators.Scale), and
  * set operations.
  *
  * Numeric policy is RelationalQueries': exact decimal arithmetic inside
  * the aggregate, final value cast to DOUBLE on both sides; any derived
  * statistic (mean, variance) is then computed with the IDENTICAL double
  * expression on both sides, so results stay bit-equal.
  */
object AnalyticsQueries {

  val all: Seq[(String, Q)] = Seq(

    "c11_cube" -> Q(
      "Cube lattice over (o_orderstatus, o_orderpriority): all 4 grouping levels with grouping id",
      (s, dir) => T.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice"), 2).as("total"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    "c12_grouping_sets" -> Q(
      "Explicit grouping sets: {(status, priority), (status), ()} — the general aggregation lattice",
      (s, dir) => T.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice"), 2).as("total"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    "q3_shipping" -> Q(
      "TPC-H Q3 shape: segment-filtered customer⋈orders⋈lineitem, top-10 open orders by revenue",
      (s, dir) => {
        val c = T.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = T.orders(s, dir)
          .filter(col("o_orderdate") < to_timestamp(lit("1998-07-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val l = T.lineitem(s, dir)
          .filter(col("l_shipdate") > to_timestamp(lit("1998-07-01 00:00:00")))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        // Dimension side (filtered customers) broadcasts; the orders⋈lineitem
        // join shuffles on orderkey — at scale both sides partition cleanly
        // on the FK and the revenue aggregation combines map-side.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    "q5_nation_revenue" -> Q(
      "TPC-H Q5 shape: 6-way join (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region), local-supplier revenue per nation",
      (s, dir) => {
        val o = T.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
            && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = T.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val c = T.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val sup = T.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        val n = T.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val r = T.region(s, dir).filter(col("r_name") === "ASIA").select(col("r_regionkey"))
        // Fact-fact join shuffles on orderkey; every dimension broadcasts.
        // The c_nationkey = s_nationkey "local supplier" predicate lands as
        // a post-join filter on two broadcast-joined columns — no extra
        // shuffle.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    "w1_window_suite" -> Q(
      "Ranking + framed-window suite per customer timeline: rank, ntile, percent_rank, cume_dist, lag/lead, rolling 3-row exact sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(-2, Window.currentRow)
        T.orders(s, dir)
          .filter(col("o_custkey") < 50L)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"),
            rank().over(w).cast("long").as("rnk"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cdist"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            sum(dec(col("o_totalprice"), 2)).over(wf).cast("double").as("rolling3"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  rank()         OVER w AS rnk,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cdist,
        |  lag(o_totalprice, 1)  OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    "c13_dispersion" -> Q(
      "Exact-arithmetic dispersion stats per order status: mean / sample variance / stddev from decimal Σx and Σx² (order-independent, engine-exact)",
      (s, dir) => {
        // Σx and Σx² are exact decimals (x is a 2-decimal monetary double,
        // so D(18,2) per-term casts are exact; the decimal product x·x is
        // exact at scale 4). Only then do we drop to double and apply the
        // textbook formulas — the same IEEE-754 expression both engines
        // evaluate, so var/stddev are bit-identical without trusting
        // either engine's internal (merge-order-dependent) moment kernels.
        val x = dec(col("o_totalprice"), 2)
        T.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(x * x).cast("double").as("sxx"))
          .select(col("o_orderstatus"), col("n"),
            (col("sx") / col("n").cast("double")).as("mean"),
            ((col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
              / (col("n").cast("double") - lit(1.0))).as("var_samp"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
              / (col("n").cast("double") - lit(1.0))).as("stddev_samp"))
          .orderBy(col("o_orderstatus"))
      },
      """WITH m AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
        |           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  sx / CAST(n AS DOUBLE) AS mean,
        |  (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_samp,
        |  sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_samp
        |FROM m ORDER BY o_orderstatus""".stripMargin),

    "skew_salted_agg" -> Q(
      "Skew-safe two-stage aggregation: salt the hot grouping key, partial-count per (key, salt), merge per key — result equals the plain groupBy",
      (s, dir) => {
        // events has only a handful of event_type values — the textbook
        // hot-key aggregation. Stage 1 spreads each key over 16 salted
        // sub-groups (deterministic salt from the row's own id); stage 2
        // merges the partials. Same two-shuffle shape AQE uses for skewed
        // aggs, expressed explicitly so it works on any engine build.
        T.events(s, dir)
          .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16L)))
          .groupBy(col("event_type"), col("salt"))
          .agg(count(lit(1)).as("pn"),
            sum(dec(col("value"), 4)).as("pv"))
          .groupBy(col("event_type"))
          .agg(sum(col("pn")).as("n"),
            sum(col("pv")).cast("double").as("total_value"))
          .orderBy(col("event_type"))
      },
      // The oracle is the UNSALTED aggregate: the salted two-stage plan
      // must be result-identical to the plain groupBy. The partial sums
      // stay DECIMAL through the merge (a multiple of 1e-4 is not
      // binary-exact, so re-adding partial doubles would drift); only the
      // final merged sum drops to double.
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    "e8_salted_join" -> Q(
      "Skew-safe salted equi-join (operators.Scale.saltedJoin): hot user fanned across salt partitions, result equals the plain join",
      (s, dir) => {
        val ev = T.events(s, dir).select(col("event_id"), col("user_id"))
        val dim = T.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        graft.operators.Scale.saltedJoin(ev, dim, "user_id", saltFactor = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("c_mktsegment"))
      },
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "layout_zorder" -> Q(
      "Z-order (Morton) layout diagnostics: o_custkey × o_orderdate interleaved into a 32-bit z-value (operators.Scale.mortonScaled — magic-number bit spreading, whole-stage codegen), then per z-bucket count + 2-D bounding box. Every bucket bounds BOTH dimensions, so parquet row-group min/max stats prune scans filtered on EITHER column — the multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER shape) a lexicographic sort can't give. Integer arithmetic end to end, so the layout key itself is oracle-checked",
      (s, dir) => {
        // The z-bucket (top 8 of 32 bits) is the unit a 100 TB layout
        // write would range-partition on; the spans ARE the data-skipping
        // effectiveness report (Scale.zorder is the writer twin).
        val base = T.orders(s, dir).select(
          col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .cast("long").as("day"))
        graft.operators.Scale.mortonScaled(base, "o_custkey", "day")
          .groupBy(shiftright(col("__z"), 24).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("o_custkey")).as("min_cust"),
            max(col("o_custkey")).as("max_cust"),
            min(col("day")).as("min_day"),
            max(col("day")).as("max_day"))
          .withColumn("cust_span", col("max_cust") - col("min_cust"))
          .withColumn("day_span", col("max_day") - col("min_day"))
          .orderBy(col("zbucket"))
      },
      // Identical shift/mask cascade in DuckDB BIGINT operators; `//` is
      // floor division (== Spark's `div` on these non-negative operands).
      """WITH base AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS ck,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM orders
        |), mm AS (
        |  SELECT MIN(ck) AS minx, MAX(ck) AS maxx,
        |         MIN(day) AS miny, MAX(day) AS maxy FROM base
        |), scaled AS (
        |  SELECT ck, day,
        |    ((ck - minx) * 65535) // GREATEST(maxx - minx, 1) AS xs,
        |    ((day - miny) * 65535) // GREATEST(maxy - miny, 1) AS ys
        |  FROM base, mm
        |), s1 AS (SELECT ck, day,
        |    ((xs | (xs << 8)) & 16711935) AS x1,
        |    ((ys | (ys << 8)) & 16711935) AS y1 FROM scaled
        |), s2 AS (SELECT ck, day,
        |    ((x1 | (x1 << 4)) & 252645135) AS x2,
        |    ((y1 | (y1 << 4)) & 252645135) AS y2 FROM s1
        |), s3 AS (SELECT ck, day,
        |    ((x2 | (x2 << 2)) & 858993459) AS x3,
        |    ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2
        |), s4 AS (SELECT ck, day,
        |    ((x3 | (x3 << 1)) & 1431655765) AS x4,
        |    ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3
        |), zed AS (SELECT ck, day, (x4 | (y4 << 1)) AS z FROM s4)
        |SELECT z >> 24 AS zbucket, COUNT(*) AS n,
        |  MIN(ck) AS min_cust, MAX(ck) AS max_cust,
        |  MIN(day) AS min_day, MAX(day) AS max_day,
        |  MAX(ck) - MIN(ck) AS cust_span, MAX(day) - MIN(day) AS day_span
        |FROM zed GROUP BY zbucket ORDER BY zbucket""".stripMargin),

    "s1_setops" -> Q(
      "Set operations: customers ordering in 1996 INTERSECT 1997, EXCEPT, and UNION cardinalities",
      (s, dir) => {
        def buyers(lo: String, hi: String): DataFrame =
          T.orders(s, dir)
            .filter(col("o_orderdate") >= to_timestamp(lit(lo))
              && col("o_orderdate") < to_timestamp(lit(hi)))
            .select(col("o_custkey")).distinct()
        val y96 = buyers("1996-01-01 00:00:00", "1997-01-01 00:00:00")
        val y97 = buyers("1997-01-01 00:00:00", "1998-01-01 00:00:00")
        // One pass over the full-outer join computes all three set
        // cardinalities (INTERSECT / EXCEPT / UNION are flag predicates on
        // the same co-partitioned join) instead of three separate jobs.
        val flags = y96.select(col("o_custkey"), lit(1).as("in96"))
          .join(y97.select(col("o_custkey"), lit(1).as("in97")),
            Seq("o_custkey"), "full_outer")
          .agg(
            count(when(col("in96").isNotNull && col("in97").isNotNull, 1)).as("both"),
            count(when(col("in96").isNotNull && col("in97").isNull, 1)).as("only_1996"),
            count(lit(1)).as("either"))
          .head()
        val s0 = s
        import s0.implicits._
        Seq(("both", flags.getLong(0)), ("either", flags.getLong(2)),
          ("only_1996", flags.getLong(1)))
          .toDF("bucket", "n_customers")
          .orderBy(col("bucket"))
      },
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |y97 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT bucket, n_customers FROM (
        |  SELECT 'both' AS bucket,
        |    (SELECT COUNT(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)) AS n_customers
        |  UNION ALL
        |  SELECT 'only_1996',
        |    (SELECT COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97))
        |  UNION ALL
        |  SELECT 'either',
        |    (SELECT COUNT(*) FROM (SELECT * FROM y96 UNION SELECT * FROM y97)))
        |ORDER BY bucket""".stripMargin),

    "b11_topk_per_group" -> Q(
      "Top-k per group: 3 highest-value orders per market segment (ranking window + filter — the lateral-join shape)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, dir)
          .join(broadcast(T.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
          .orderBy(col("c_mktsegment"), col("rnk"))
      },
      """SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3
        |ORDER BY c_mktsegment, rnk""".stripMargin),

    "c16_string_agg" -> Q(
      "Ordered string aggregation: comma-joined sorted nation names per region",
      (s, dir) => T.nation(s, dir)
        .join(broadcast(T.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name")),
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    "cms_heavy_hitters" -> Q(
      "Count-Min-Sketch heavy hitters: CMS estimates for the exact top-20 tokens must equal their exact counts (width 16384 × depth 5 leaves every test-corpus token collision-free in at least one row)",
      (s, dir) => {
        import graft.functions.CountMinSketchAggregator
        import graft.functions.TextFunctions._
        val W = 16384; val D = 5
        // Tokens are derived twice (sketch pass + exact pass) instead of
        // persisted: re-scanning the columnar source and re-splitting is
        // cheaper than materializing the exploded token stream in the
        // block manager, and leaves no cached blocks behind.
        def toks = T.documentsSpread(s, dir)
          .select(explode(tokens(col("text"))).as("tok"))
        // The sketch is an index-like artifact: fixed 640 KB regardless of
        // corpus size (the whole point at 100 TB). Collecting it to the
        // driver is the same boundary IvfIndex.train crosses for its
        // centroids. Partition-local sketches merged once (treeAggregate)
        // — the udaf form round-tripped the full 640 KB buffer per row.
        import s.implicits._
        val sketch = CountMinSketchAggregator
          .sketchPartitioned(toks.as[String], W, D)
        val est = udf((t: String) =>
          CountMinSketchAggregator.estimate(sketch, t, W, D))
        toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("tok"))
          .limit(20)
          .withColumn("cms_est", est(col("tok")))
          .select("tok", "n_exact", "cms_est")
      },
      // The oracle asserts the sketch is exact on the heavy hitters: both
      // columns are the true count. A CMS over-estimate on any top-20
      // token would hash-mismatch. (Deterministic: fixed seeds, fixed
      // corpus.)
      """SELECT tok, COUNT(*) AS n_exact, COUNT(*) AS cms_est
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |GROUP BY tok
        |ORDER BY COUNT(*) DESC, tok LIMIT 20""".stripMargin),

    "c14_quartiles" -> Q(
      "Exact interpolated quartiles per order status (both engines: linear interpolation at rank (n-1)p over sorted doubles)",
      (s, dir) => T.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.25)").as("q1"),
          expr("percentile(o_totalprice, 0.5)").as("median"),
          expr("percentile(o_totalprice, 0.75)").as("q3"))
        .orderBy(col("o_orderstatus")),
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS q1,
        |  quantile_cont(o_totalprice, 0.5)  AS median,
        |  quantile_cont(o_totalprice, 0.75) AS q3
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    "c14_quartiles_approx" -> Q(
      "Approximate quartiles per order status via approx_percentile (KLL-style mergeable sketch, accuracy 10000): the documented scale toggle for c14_quartiles — exact per-group percentile needs the whole group sorted in one place, the sketch is fixed-size and merges map-side, so the shuffle carries sketches not rows. Rows-only by design (sketch internals are engine-specific); SketchSpec-style envelope vs the exact quartiles is pinned in AnalyticsSpec",
      (s, dir) => T.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.25, 10000)").as("q1"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("median"),
          expr("approx_percentile(o_totalprice, 0.75, 10000)").as("q3"))
        .orderBy(col("o_orderstatus")),
      None),

    "b10_bloom_prefilter" -> Q(
      "Bloom-filter join pruning: build a bloom filter over the dimension keys, pre-filter the fact scan with might_contain, then exact semi-join — result identical to the plain semi-join, scan volume cut before the shuffle",
      (s, dir) => {
        // The bloom filter is the runtime-filter artifact Spark itself
        // injects at scale (spark.sql.optimizer.runtime.bloomFilter); built
        // explicitly here as an operator. False positives are filtered by
        // the exact join that follows, so the bloom stage only reduces the
        // shuffled volume — the result is exactly the semi-join's.
        val buyers = T.orders(s, dir)
          .filter(col("o_totalprice") > 400000.0)
          .select(col("o_custkey"))
        val bloom = buyers.stat.bloomFilter("o_custkey", 10000L, 0.01)
        val bloomBc = s.sparkContext.broadcast(bloom)
        val mightContain = udf((k: Long) => bloomBc.value.mightContain(k))
        T.customer(s, dir)
          .filter(mightContain(col("c_custkey"))) // cheap pre-shuffle prune
          .join(buyers, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin),

    "hll_distinct" -> Q(
      "HyperLogLog sketches (Apache DataSketches): mergeable per-group distinct-user sketches, rows-only (estimates are sketch-algorithm-specific; HllSpec pins the error envelope vs exact)",
      (s, dir) => {
        // The mergeable-sketch shape: per-group HLL sketches union over
        // partitions (partial+final agg), so the shuffle carries one
        // sketch per group per partition — the distinct-count path when
        // exact countDistinct's per-key shuffle is unaffordable.
        T.events(s, dir)
          .groupBy(col("event_type"))
          .agg(hll_sketch_estimate(
            hll_sketch_agg(col("user_id"), lit(12))).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          .orderBy(col("event_type"))
      },
      None),

    "hll_distinct_exact" -> Q(
      "HLL exactness-envelope anchor (the ann_pq_exact pattern, VERDICT r7 task #6): the identical sketch-agg → merge → estimate pipeline as hll_distinct, on a keyspace bounded to 256 values — far below the lgK=12 sketch's coupon-list capacity, so the sketch never leaves its EXACT sparse mode and the rounded estimate equals COUNT(DISTINCT) by construction. Pins the HLL plumbing (hashing, partial-sketch merge across partitions, estimator) to a DuckDB hash row; the error envelope at large cardinality stays spec-checked (SketchSpec) on the rows-only twin",
      (s, dir) => {
        T.events(s, dir)
          .filter(col("value") > 180.0)
          .groupBy(col("event_type"))
          .agg(
            round(hll_sketch_estimate(
              hll_sketch_agg(pmod(col("user_id"), lit(256)), lit(12))))
              .cast("long").as("users_hll"),
            countDistinct(pmod(col("user_id"), lit(256))).as("users_exact"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id % 256) AS BIGINT) AS users_hll,
        |  CAST(COUNT(DISTINCT user_id % 256) AS BIGINT) AS users_exact
        |FROM events WHERE value > 180.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    "c18_mode" -> Q(
      "Deterministic mode: most frequent order priority per status, ties broken by LARGEST priority (max over (count, value) structs; engines' native mode() leaves ties undefined — spelled out as count-then-argmax instead)",
      (s, dir) => {
        val counts = T.orders(s, dir)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("c"))
        counts.groupBy(col("o_orderstatus"))
          .agg(max(struct(col("c"), col("o_orderpriority"))).as("m"))
          .select(col("o_orderstatus"),
            col("m.o_orderpriority").as("mode_priority"),
            col("m.c").as("n"))
          .orderBy(col("o_orderstatus"))
      },
      // struct max = (highest count, then lexicographically LARGEST value);
      // the oracle spells the identical argmax as a ranking window
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, c AS n FROM (
        |  SELECT o_orderstatus, o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY c DESC, o_orderpriority DESC) AS rn
        |  FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
        |    FROM orders GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin),

    "ts1_rolling_stats" -> Q(
      "Rolling time-series features: per-user 7-event trailing exact mean and count over the event timeline (framed window, decimal-exact arithmetic)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        T.events(s, dir)
          .filter(col("user_id") < 20L)
          .select(col("user_id"), col("event_id"),
            date_trunc("second", col("ts")).as("ts_sec"), col("value"))
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            count(lit(1)).over(w).as("n_window"),
            (sum(dec(col("value"), 4)).over(w).cast("double")
              / count(lit(1)).over(w).cast("double")).as("rolling_mean"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      """SELECT user_id, event_id, ts_sec,
        |  COUNT(*) OVER w AS n_window,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / CAST(COUNT(*) OVER w AS DOUBLE) AS rolling_mean
        |FROM (SELECT user_id, event_id, date_trunc('second', ts) AS ts_sec, value
        |  FROM events WHERE user_id < 20)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_sec, event_id""".stripMargin),

    "c19_incremental_agg" -> Q(
      "Incremental aggregate maintenance (materialized-view refresh shape): the standing per-type rollup is NOT recomputed from the full fact table — the pre-cutoff base aggregate and the post-cutoff delta aggregate are merged by algebraic-aggregate rules (counts add, decimal sums add, maxes max). At 100 TB the base is a stored few-row table and each refresh touches only the delta partition; the oracle computes the same merge from scratch, proving merge == full recompute",
      (s, dir) => {
        val cutoff = to_timestamp(lit("2024-01-20 00:00:00"))
        val x = dec(col("value"), 4)
        def rollup(df: DataFrame) = df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(x).as("sv"),
            max(date_trunc("second", col("ts"))).as("last_ts"))
        val base = rollup(T.events(s, dir).filter(col("ts") < cutoff))
        val delta = rollup(T.events(s, dir).filter(col("ts") >= cutoff))
        base.join(delta, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(base("n"), lit(0L)) + coalesce(delta("n"), lit(0L))).as("n"),
            (coalesce(base("sv"), lit(0).cast(DecimalType(18, 4)))
              + coalesce(delta("sv"), lit(0).cast(DecimalType(18, 4))))
              .cast("double").as("sum_value"),
            greatest(base("last_ts"), delta("last_ts")).as("last_ts"))
          .orderBy(col("event_type"))
      },
      """WITH base AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv,
        |    MAX(date_trunc('second', ts)) AS last_ts
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        |  GROUP BY event_type),
        |delta AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv,
        |    MAX(date_trunc('second', ts)) AS last_ts
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |  GROUP BY event_type)
        |SELECT COALESCE(b.event_type, d.event_type) AS event_type,
        |  COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
        |  CAST(COALESCE(b.sv, 0) + COALESCE(d.sv, 0) AS DOUBLE) AS sum_value,
        |  greatest(b.last_ts, d.last_ts) AS last_ts
        |FROM base b FULL OUTER JOIN delta d ON b.event_type = d.event_type
        |ORDER BY event_type""".stripMargin),

    "feat2_winsorize" -> Q(
      "Feature engineering: per-event-type winsorization at p05/p95 — exact interpolated percentile cuts (the c14_quartiles parity contract) computed once per group, broadcast back, values clipped row-locally; emits per-type clip counts and the decimal-exact clipped mean. The standard tail-taming step before a model consumes a heavy-tailed 100 TB feature column: one bounded stats aggregate plus a scan",
      (s, dir) => {
        val cuts = T.events(s, dir)
          .groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.05)").as("lo"),
            expr("percentile(value, 0.95)").as("hi"))
        T.events(s, dir)
          .join(broadcast(cuts), Seq("event_type"))
          .select(col("event_type"), col("lo"), col("hi"), col("value"),
            least(greatest(col("value"), col("lo")), col("hi")).as("clipped"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            first(col("lo")).as("lo"), first(col("hi")).as("hi"),
            sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
            (decSum(col("clipped"), 4) / count(lit(1)).cast("double"))
              .as("clipped_mean"))
          .orderBy(col("event_type"))
      },
      """WITH cuts AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type AS event_type, COUNT(*) AS n_events,
        |  any_value(c.lo) AS lo, any_value(c.hi) AS hi,
        |  CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  CAST(SUM(CAST(least(greatest(e.value, c.lo), c.hi)
        |      AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS clipped_mean
        |FROM events e JOIN cuts c ON e.event_type = c.event_type
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin),

    "feat3_standardize" -> Q(
      "Feature engineering: per-event-type z-score standardization — mean and sample stddev from decimal-exact moments (the c13_dispersion kernel), broadcast back, z computed row-locally with the identical IEEE-754 expression on both engines; emits each type's extreme standardized event (largest |z|, event_id tie-break) as the audit row",
      (s, dir) => {
        val x = dec(col("value"), 4)
        val stats = T.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(x * x).cast("double").as("sxx"))
          .select(col("event_type"),
            (col("sx") / col("n").cast("double")).as("mean_v"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
              / (col("n").cast("double") - lit(1.0))).as("sd"))
        val z = (col("value") - col("mean_v")) / col("sd")
        val w = Window.partitionBy(col("event_type"))
          .orderBy(abs(z).desc, col("event_id"))
        T.events(s, dir)
          .join(broadcast(stats), Seq("event_type"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("event_id"), col("value"),
            col("mean_v"), col("sd"), z.as("z"))
          .orderBy(col("event_type"))
      },
      """WITH m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))
        |      * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY event_type),
        |stats AS (
        |  SELECT event_type, sx / CAST(n AS DOUBLE) AS mean_v,
        |    sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)) AS sd
        |  FROM m),
        |ranked AS (
        |  SELECT e.event_type AS event_type, e.event_id AS event_id,
        |    e.value AS value, s.mean_v AS mean_v, s.sd AS sd,
        |    (e.value - s.mean_v) / s.sd AS z,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_type
        |      ORDER BY abs((e.value - s.mean_v) / s.sd) DESC, e.event_id) AS rn
        |  FROM events e JOIN stats s ON e.event_type = s.event_type)
        |SELECT event_type, event_id, value, mean_v, sd, z
        |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin),

    "g7_markov" -> Q(
      "First-order Markov transition model over user event streams: per-user (current, next) event-type pairs from a LEAD window, rolled up to corpus-wide transition counts and conditional probabilities P(next | current) — the behavioral model behind next-action prediction and bot detection. The window is per-entity bounded work (the sessionize pattern: one hash shuffle on user_id); the transition matrix is event-type² rows, trivially small at any corpus size",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val seq = T.events(s, dir)
          .select(col("user_id"), col("event_id"),
            date_trunc("second", col("ts")).as("ts_sec"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
        val trans = seq.groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = trans.groupBy(col("event_type")).agg(sum(col("n")).as("n_from"))
        trans.join(tot, Seq("event_type"))
          .select(col("event_type"), col("next_type"), col("n"),
            (col("n").cast("double") / col("n_from").cast("double")).as("p"))
          .orderBy(col("event_type"), col("next_type"))
      },
      """WITH seq AS (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('second', ts), event_id) AS next_type
        |  FROM events),
        |trans AS (
        |  SELECT event_type, next_type, COUNT(*) AS n FROM seq
        |  WHERE next_type IS NOT NULL GROUP BY event_type, next_type),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_from
        |  FROM trans GROUP BY event_type)
        |SELECT t.event_type AS event_type, t.next_type AS next_type, t.n AS n,
        |  CAST(t.n AS DOUBLE) / CAST(o.n_from AS DOUBLE) AS p
        |FROM trans t JOIN tot o ON t.event_type = o.event_type
        |ORDER BY event_type, next_type""".stripMargin),

    "ts2_ewma" -> Q(
      "Per-user exponentially-weighted moving average (α=0.25) over the event timeline — the decay-smoothed signal behind rate limiting and trend alerts. EWMA is inherently sequential, so each user's events fold left-to-right in ONE pinned order (sort_array over (ts, event_id, value) structs == DuckDB list(... ORDER BY)): the fold is per-entity bounded work like sessionize, the cross-user layout is one hash shuffle, and the fold arithmetic (acc*0.75 + x*0.25, seeded with the first value) is the identical binary64 sequence on both engines",
      (s, dir) => {
        val vals = transform(
          sort_array(collect_list(struct(
            date_trunc("second", col("ts")).as("ts_sec"),
            col("event_id"), col("value")))),
          e => e.getField("value"))
        T.events(s, dir)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), vals.as("vals"))
          .select(col("user_id"), col("n_events"),
            aggregate(
              slice(col("vals"), lit(2), size(col("vals")) - 1),
              element_at(col("vals"), 1),
              (acc, x) => acc * lit(0.75) + x * lit(0.25)).as("ewma"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id, COUNT(*) AS n_events,
        |  list_reduce(
        |    list(value ORDER BY date_trunc('second', ts), event_id),
        |    (acc, x) -> acc * 0.75 + x * 0.25) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    "ts3_anomaly_mad" -> Q(
      "Robust anomaly detection via median absolute deviation: per event type, median and MAD (median of |value - median|), then events flagged where |value - median| > 3 MAD — the outlier gate that, unlike q6_anomaly's 3-sigma, is itself immune to the outliers it hunts. Two grouped exact-percentile passes over a type-count-bounded stats table that broadcasts back; interpolation parity is the c14_quartiles contract",
      (s, dir) => {
        val med = T.events(s, dir)
          .groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val absdev = T.events(s, dir)
          .join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), col("value"), col("med"),
            abs(col("value") - col("med")).as("adev"))
        val mad = absdev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        absdev.join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            first(col("med")).as("med"),
            first(col("mad")).as("mad"),
            count(when(col("adev") > lit(3.0) * col("mad"), 1)).as("n_anomalies"))
          .orderBy(col("event_type"))
      },
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |adev AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM adev GROUP BY event_type)
        |SELECT a.event_type AS event_type, COUNT(*) AS n_events,
        |  any_value(a.med) AS med, any_value(d.mad) AS mad,
        |  COUNT(CASE WHEN a.adev > 3.0 * d.mad THEN 1 END) AS n_anomalies
        |FROM adev a JOIN mad d ON a.event_type = d.event_type
        |GROUP BY a.event_type ORDER BY event_type""".stripMargin),

    "q6_anomaly" -> Q(
      "3-sigma anomaly counts per event type: exact-moment mean/stddev (decimal Σx, Σx², sqrt is IEEE-exact) joined back as a row-local predicate",
      (s, dir) => {
        val x = dec(col("value"), 4)
        val stats = T.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(x * x).cast("double").as("sxx"))
          .select(col("event_type"),
            (col("sx") / col("n").cast("double")).as("mean_v"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
              / (col("n").cast("double") - lit(1.0))).as("sd"))
        T.events(s, dir)
          .join(broadcast(stats), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            count(when(col("value") > col("mean_v") + lit(3.0) * col("sd"), 1))
              .as("n_anomalies"))
          .orderBy(col("event_type"))
      },
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mean_v,
        |    sqrt((CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |        - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |          * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |      / (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT events.event_type AS event_type, COUNT(*) AS n_events,
        |  COUNT(CASE WHEN value > mean_v + 3.0 * sd THEN 1 END) AS n_anomalies
        |FROM events JOIN stats ON events.event_type = stats.event_type
        |GROUP BY events.event_type ORDER BY event_type""".stripMargin),

    "feat1_quantile_bins" -> Q(
      "Feature engineering: decile binning of order values (ntile over a deterministic total order) with per-bin count, bounds, exact mean. Small-data form: the no-partition window is a single-partition sort — use feat1_quantile_bins_scale beyond memory scale",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
        T.orders(s, dir)
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            (sum(dec(col("o_totalprice"), 2)).cast("double")
              / count(lit(1)).cast("double")).as("mean_v"))
          .orderBy(col("decile"))
      },
      """SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_v
        |FROM (SELECT o_totalprice,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |GROUP BY decile ORDER BY decile""".stripMargin),

    "feat1_quantile_bins_scale" -> Q(
      "Scale-safe decile binning: exact percentile cut points (one aggregate) broadcast to a row-local bucket assignment — no global sort. The ntile form above is the small-data twin; at 100 TB swap percentile -> approx_percentile (identical plumbing, sketch-mergeable cuts)",
      (s, dir) => {
        // Cut points are ONE aggregate over the table (9 doubles), then
        // every row buckets itself against the broadcast array — the
        // shape that survives 100 TB, unlike ntile's single-partition
        // window sort. Value-boundary semantics (ties share a bin), so
        // bin populations need not be exactly n/10 like ntile's.
        // Spark percentile() is bit-identical to DuckDB quantile_cont
        // (pinned by the c14_quartiles oracle), so strict `>` comparisons
        // against the cuts agree cross-engine.
        val cuts = T.orders(s, dir)
          .agg(expr(s"percentile(o_totalprice, array(${(1 to 9).map(_ / 10.0).mkString(",")}))")
            .as("cs"))
        T.orders(s, dir)
          .crossJoin(broadcast(cuts))
          .withColumn("bin",
            (lit(1) + size(filter(col("cs"), c => col("o_totalprice") > c)))
              .cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            (sum(dec(col("o_totalprice"), 2)).cast("double")
              / count(lit(1)).cast("double")).as("mean_v"))
          .orderBy(col("bin"))
      },
      s"""WITH cuts AS (
         |  SELECT quantile_cont(o_totalprice, [${(1 to 9).map(_ / 10.0).mkString(",")}]) AS cs
         |  FROM orders)
         |SELECT bin, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS mean_v
         |FROM (SELECT o_totalprice,
         |    CAST(1 + len(list_filter(cs, c -> o_totalprice > c)) AS BIGINT) AS bin
         |  FROM orders, cuts)
         |GROUP BY bin ORDER BY bin""".stripMargin),

    "g5_funnel" -> Q(
      "Two-step funnel: users whose first 'click' precedes a later 'purchase' — conditional-min aggregation, one pass over events",
      (s, dir) => {
        val ev = T.events(s, dir)
          .select(col("user_id"), col("event_type"),
            date_trunc("second", col("ts")).as("ts_sec"))
        ev.groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "click", col("ts_sec"))).as("first_click"),
            max(when(col("event_type") === "purchase", col("ts_sec"))).as("last_purchase"))
          .filter(col("first_click").isNotNull && col("last_purchase").isNotNull
            && col("last_purchase") > col("first_click"))
          .agg(count(lit(1)).as("n_converted"))
      },
      """SELECT COUNT(*) AS n_converted FROM (
        |  SELECT user_id,
        |    MIN(date_trunc('second', ts)) FILTER (event_type = 'click') AS first_click,
        |    MAX(date_trunc('second', ts)) FILTER (event_type = 'purchase') AS last_purchase
        |  FROM events GROUP BY user_id)
        |WHERE first_click IS NOT NULL AND last_purchase IS NOT NULL
        |  AND last_purchase > first_click""".stripMargin),

    "g6_retention" -> Q(
      "Weekly cohort retention: users grouped by first-active week; how many return the following week",
      (s, dir) => {
        val weeks = T.events(s, dir)
          .select(col("user_id"),
            date_trunc("week", date_trunc("second", col("ts"))).as("week"))
          .distinct()
        val cohort = weeks.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        cohort
          .join(weeks, Seq("user_id"))
          .groupBy(col("cohort_week"))
          .agg(countDistinct(col("user_id")).as("cohort_size"),
            countDistinct(when(col("week") === col("cohort_week")
              + expr("INTERVAL 7 DAYS"), col("user_id"))).as("retained_next_week"))
          .orderBy(col("cohort_week"))
      },
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    date_trunc('week', date_trunc('second', ts)) AS week
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
        |SELECT cohort_week,
        |  COUNT(DISTINCT weeks.user_id) AS cohort_size,
        |  COUNT(DISTINCT CASE WHEN week = cohort_week + INTERVAL 7 DAY
        |    THEN weeks.user_id END) AS retained_next_week
        |FROM cohort JOIN weeks ON cohort.user_id = weeks.user_id
        |GROUP BY cohort_week ORDER BY cohort_week""".stripMargin),

    "g8_cohort_matrix" -> Q(
      "Full cohort retention matrix (the product-analytics triangle g6 summarizes one diagonal of): per (first-active week, week offset) — distinct returning users and the retention rate against the cohort's size. One distinct (user, week) table feeds both the cohort assignment and the activity join; the matrix is weeks² rows, trivially small at any event volume",
      (s, dir) => {
        val weeks = T.events(s, dir)
          .select(col("user_id"),
            date_trunc("week", date_trunc("second", col("ts"))).as("week"))
          .distinct()
        val cohort = weeks.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        val sizes = cohort.groupBy(col("cohort_week"))
          .agg(countDistinct(col("user_id")).as("cohort_size"))
        cohort.join(weeks, Seq("user_id"))
          .select(col("cohort_week"),
            datediff(col("week"), col("cohort_week")).cast("long")
              .divide(7L).cast("long").as("week_offset"),
            col("user_id"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(sizes), Seq("cohort_week"))
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"),
            (col("n_active").cast("double") / col("cohort_size").cast("double"))
              .as("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    date_trunc('week', date_trunc('second', ts)) AS week
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
        |sizes AS (
        |  SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
        |  FROM cohort GROUP BY cohort_week),
        |m AS (
        |  SELECT c.cohort_week,
        |    CAST(CAST(date_diff('day', c.cohort_week, w.week) AS BIGINT) / 7
        |      AS BIGINT) AS week_offset,
        |    COUNT(DISTINCT w.user_id) AS n_active
        |  FROM cohort c JOIN weeks w ON c.user_id = w.user_id
        |  GROUP BY 1, 2)
        |SELECT m.cohort_week, m.week_offset, m.n_active, s.cohort_size,
        |  CAST(m.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
        |    AS retention
        |FROM m JOIN sizes s ON m.cohort_week = s.cohort_week
        |ORDER BY m.cohort_week, m.week_offset""".stripMargin),

    "g9_interarrival" -> Q(
      "Inter-arrival-time profile per user: median and p90 gap between consecutive events plus the max silent stretch — the churn/engagement signal. A per-entity LAG window (sessionize shuffle) feeds grouped exact percentiles; the per-user output is entity-table-sized",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val gaps = T.events(s, dir)
          .select(col("user_id"), col("event_id"),
            date_trunc("second", col("ts")).as("ts_sec"))
          .withColumn("prev", lag(col("ts_sec"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("user_id"),
            (unix_timestamp(col("ts_sec")) - unix_timestamp(col("prev")))
              .as("gap_s"))
        gaps.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            expr("percentile(gap_s, 0.5)").as("median_gap_s"),
            expr("percentile(gap_s, 0.9)").as("p90_gap_s"),
            max(col("gap_s")).as("max_gap_s"))
          .orderBy(col("user_id"))
      },
      """WITH gaps AS (
        |  SELECT user_id,
        |    CAST(date_diff('second',
        |      LAG(date_trunc('second', ts), 1) OVER (PARTITION BY user_id
        |        ORDER BY date_trunc('second', ts), event_id),
        |      date_trunc('second', ts)) AS BIGINT) AS gap_s
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |  quantile_cont(gap_s, 0.5) AS median_gap_s,
        |  quantile_cont(gap_s, 0.9) AS p90_gap_s,
        |  CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        |FROM gaps WHERE gap_s IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    "g10_attribution" -> Q(
      "First-touch / last-touch conversion attribution: for every purchase, " +
        "the user's earliest and latest preceding touch event (view/click, " +
        "strictly before the conversion in (ts, event_id) order), rolled up " +
        "to attributed-conversion counts per touch type and position — the " +
        "marketing-analytics report every event warehouse ships. Both " +
        "touches come from ONE per-user window pass (conditional struct " +
        "min/max over the unbounded-preceding frame), so the cost is the " +
        "sessionize shuffle and nothing more; no self-join of conversions " +
        "against touches, which at 100 TB would pay a second exchange and " +
        "skew on power users",
      (s, dir) => {
        val touch = col("event_type").isin("view", "click")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val t = struct(col("ts_sec"), col("event_id"),
          col("event_type").as("t"))
        val att = T.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_trunc("second", col("ts")).as("ts_sec"))
          .withColumn("first_t", min(when(touch, t)).over(w))
          .withColumn("last_t", max(when(touch, t)).over(w))
          .filter(col("event_type") === "purchase" && col("last_t").isNotNull)
          .select(col("first_t.t").as("ft"), col("last_t.t").as("lt"))
        att.select(explode(array(
            struct(lit("first_touch").as("position"), col("ft").as("event_type")),
            struct(lit("last_touch").as("position"), col("lt").as("event_type"))))
            .as("x"))
          .groupBy(col("x.position").as("position"),
            col("x.event_type").as("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("position"), col("event_type"))
      },
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    date_trunc('second', ts) AS ts_sec
        |  FROM events),
        |marked AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN event_type IN ('view','click')
        |      THEN {'ts': ts_sec, 'eid': event_id, 't': event_type} END)
        |      OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_t,
        |    MAX(CASE WHEN event_type IN ('view','click')
        |      THEN {'ts': ts_sec, 'eid': event_id, 't': event_type} END)
        |      OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_t
        |  FROM ev),
        |att AS (
        |  SELECT first_t.t AS ft, last_t.t AS lt FROM marked
        |  WHERE event_type = 'purchase' AND last_t IS NOT NULL)
        |SELECT 'first_touch' AS position, ft AS event_type, COUNT(*) AS n
        |FROM att GROUP BY ft
        |UNION ALL
        |SELECT 'last_touch', lt, COUNT(*) FROM att GROUP BY lt
        |ORDER BY position, event_type""".stripMargin),

    "samp1_stratified" -> Q(
      "Deterministic stratified sampling: ~25% of documents per source by md5 hash bucket — reproducible on any engine, no RNG state",
      (s, dir) => {
        // hash-mod sampling: md5 of the key's decimal string is engine
        // -portable (same bytes → same hex); the first two hex chars give
        // 256 buckets, keep 64 → exactly the same rows everywhere. This is
        // how a 100 TB pipeline samples reproducibly — no seed handoff, no
        // sampler state, membership recomputable row-local at any time.
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long")
        T.documents(s, dir)
          .filter(bucket < 64L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("source"))
      },
      """SELECT source, COUNT(*) AS n_sampled, MIN(doc_id) AS first_id
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) < 64
        |GROUP BY source ORDER BY source""".stripMargin),

    "samp2_split" -> Q(
      "Deterministic train/val/test split (80/10/10 by hash bucket): split sizes per source, reproducible row-local on any engine",
      (s, dir) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long")
        T.documents(s, dir)
          .withColumn("split",
            when(bucket < 204L, "train")
              .when(bucket < 230L, "val")
              .otherwise("test"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("source"), col("split"))
      },
      """SELECT source,
        |  CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM (SELECT source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) AS b
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY source, split""".stripMargin),

    "samp3_per_group" -> Q(
      "Deterministic per-group k-sample (reservoir-sampling semantics, engine-portable): rank rows inside each source by md5(doc_id), keep the 5 smallest — a uniform-at-random fixed-k sample per group that any engine reproduces bit-for-bit, unlike rand()-based reservoirs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // md5 of the id is the portable random key: uniform, stable, and
        // identical in every engine — the property rand(seed) lacks.
        // Plans as one hash-partitioned window per group with
        // WindowGroupLimit pushing the top-5 below the sort at scale.
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        T.documents(s, dir)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("source"), col("rk"), col("doc_id"))
          .orderBy(col("source"), col("rk"))
      },
      """SELECT source, rk, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin),

    "samp4_pps_systematic" -> Q(
      "Systematic probability-proportional-to-size sampling (Madow 1949, " +
        "the survey-sampling classic; in a data pipeline: sample documents " +
        "with inclusion probability proportional to length so the SAMPLE's " +
        "token mass mirrors the corpus without importance reweighting): a " +
        "document is selected iff its cumulative-weight interval " +
        "(cum - w, cum] crosses a multiple of the stride — pure integer " +
        "arithmetic, zero RNG state, docs longer than the stride are " +
        "always taken. The prefix sum is per hash shard (bounded window, " +
        "the pack_sequences shape), never a global sort; every shard " +
        "samples independently at the same stride, so the estimator is " +
        "unchanged and a 100 TB frame needs no total order",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val Stride = 1000L
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.documents(s, dir)
          .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
            col("n_chars").as("w"))
          .withColumn("cum", sum(col("w")).over(w))
          .filter(expr(s"cum div $Stride") > expr(s"(cum - w) div $Stride"))
          .select(col("doc_id"), col("shard"), col("w"), col("cum"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, shard, w, cum FROM (
        |  SELECT doc_id, doc_id % 8 AS shard, n_chars AS w,
        |    CAST(SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents)
        |WHERE cum // 1000 > (cum - w) // 1000
        |ORDER BY doc_id""".stripMargin),

    "samp5_pps_poisson" -> Q(
      "Poisson PPS sampling (the independent-inclusion companion of " +
        "samp4_pps_systematic — Poisson sampling gives exchangeable, " +
        "restart-free membership a stream can evaluate per row, at the " +
        "price of a random sample size): include a document iff " +
        "h40 * stride < n_chars * 2^40, where h40 is the first 40 md5 bits " +
        "of its id — an integer-exact Bernoulli draw with inclusion " +
        "probability min(1, n_chars/stride), no RNG state, identical on " +
        "every engine (cross-multiplied, overflow-safe for docs to 2^23 " +
        "chars). Emits each sampled doc with its inclusion probability and " +
        "Horvitz-Thompson weight 1/pi, so downstream estimates stay " +
        "unbiased. Fully row-local: THE sampling shape for a 100 TB scan",
      (s, dir) => {
        val Stride = 1000L
        val h40 = conv(substring(md5(col("doc_id").cast("string")), 1, 10), 16, 10)
          .cast("long")
        val pi = least(lit(1.0), col("n_chars").cast("double") / Stride.toDouble)
        T.documents(s, dir)
          .filter(h40 * Stride < col("n_chars") * lit(1099511627776L))
          .select(col("doc_id"), col("n_chars").as("w"),
            pi.as("incl_p"), (lit(1.0) / pi).as("ht_weight"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id, n_chars AS w,
        |  least(1.0, n_chars::DOUBLE / 1000.0) AS incl_p,
        |  1.0 / least(1.0, n_chars::DOUBLE / 1000.0) AS ht_weight
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
        |    * 1000 < n_chars * 1099511627776
        |ORDER BY doc_id""".stripMargin),

    "report_sampling_design" -> Q(
      "Sampling-design comparison report (the dial-setting run before " +
        "committing a sampling scheme, the dedup_lsh_tuning posture): ONE " +
        "corpus scan evaluates all three membership predicates row-locally " +
        "— uniform hash-bucket (samp1's 64/256 rule), systematic PPS " +
        "(samp4's stride-crossing over the per-shard prefix sum) and " +
        "Poisson PPS (samp5's 40-bit Bernoulli) — and reports, per design, " +
        "sampled docs and the sampled fraction of corpus token mass. " +
        "Uniform sampling under-covers mass exactly when length varies; " +
        "the two PPS designs track mass by construction — this report is " +
        "where that shows as a number. Cost: one window (the samp4 prefix " +
        "sum) + one aggregation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val Stride = 1000L
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val h2 = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long")
        val h40 = conv(substring(md5(col("doc_id").cast("string")), 1, 10), 16, 10)
          .cast("long")
        val staged = T.documents(s, dir)
          .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
            col("n_chars").as("wt"))
          .withColumn("cum", sum(col("wt")).over(w))
          .select(col("wt"),
            (h2 < 64L).as("in_uniform"),
            (expr(s"cum div $Stride") > expr(s"(cum - wt) div $Stride"))
              .as("in_systematic"),
            (h40 * Stride < col("wt") * lit(1099511627776L)).as("in_poisson"))
        // ONE aggregation computes all six conditional sums; the 3-row
        // report unpivots from that single pass (no window recompute)
        def ns(flag: org.apache.spark.sql.Column) =
          sum(when(flag, 1L).otherwise(0L))
        def ms(flag: org.apache.spark.sql.Column) =
          sum(when(flag, col("wt")).otherwise(0L))
        staged.agg(
            count(lit(1)).as("n_docs"), sum(col("wt")).as("tot"),
            ns(col("in_uniform")).as("nu"), ms(col("in_uniform")).as("mu"),
            ns(col("in_systematic")).as("nsy"), ms(col("in_systematic")).as("msy"),
            ns(col("in_poisson")).as("npo"), ms(col("in_poisson")).as("mpo"))
          .select(col("n_docs"), col("tot"), explode(array(
            struct(lit("poisson_pps").as("design"),
              col("npo").as("n_sampled"), col("mpo").as("m")),
            struct(lit("systematic_pps").as("design"),
              col("nsy").as("n_sampled"), col("msy").as("m")),
            struct(lit("uniform_hash").as("design"),
              col("nu").as("n_sampled"), col("mu").as("m")))).as("x"))
          .select(col("x.design").as("design"), col("n_docs"),
            col("x.n_sampled").as("n_sampled"),
            (col("x.m").cast("double") / col("tot").cast("double"))
              .as("mass_frac"))
          .orderBy(col("design"))
      },
      """WITH staged AS (
        |  SELECT n_chars AS wt,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) < 64
        |      AS in_uniform,
        |    CAST(SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) // 1000
        |      > CAST(SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |        ROWS UNBOUNDED PRECEDING) - n_chars AS BIGINT) // 1000
        |      AS in_systematic,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
        |        * 1000 < n_chars * 1099511627776 AS in_poisson
        |  FROM documents),
        |u AS (SELECT 'uniform_hash' AS design, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN in_uniform THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(SUM(CASE WHEN in_uniform THEN wt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(wt) AS DOUBLE) AS mass_frac FROM staged),
        |sy AS (SELECT 'systematic_pps', COUNT(*),
        |  CAST(SUM(CASE WHEN in_systematic THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN in_systematic THEN wt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(wt) AS DOUBLE) FROM staged),
        |po AS (SELECT 'poisson_pps', COUNT(*),
        |  CAST(SUM(CASE WHEN in_poisson THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN in_poisson THEN wt ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(wt) AS DOUBLE) FROM staged)
        |SELECT * FROM u UNION ALL SELECT * FROM sy UNION ALL SELECT * FROM po
        |ORDER BY design""".stripMargin),

    "g4_gap_fill" -> Q(
      "Time-series gap filling: dense daily spine (sequence + explode) left-joined to per-day counts, zero-filled",
      (s, dir) => {
        val ev = T.events(s, dir)
          .select(date_trunc("day", col("ts")).as("day"))
        val bounds = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        // dense spine: one row per calendar day in the observed range —
        // generated, not scanned, so gaps cost nothing at any scale
        val spine = bounds.select(
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 DAY"))).as("day"))
        val perDay = ev.groupBy(col("day")).agg(count(lit(1)).as("n_raw"))
        spine.join(perDay, Seq("day"), "left_outer")
          .select(col("day"), coalesce(col("n_raw"), lit(0L)).as("n"))
          .orderBy(col("day"))
      },
      """WITH ev AS (SELECT date_trunc('day', ts) AS day FROM events),
        |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds),
        |per_day AS (SELECT day, COUNT(*) AS n_raw FROM ev GROUP BY day)
        |SELECT spine.day AS day, COALESCE(n_raw, 0) AS n
        |FROM spine LEFT JOIN per_day ON spine.day = per_day.day
        |ORDER BY day""".stripMargin),

    "p1_profile" -> Q(
      "Single-pass column profiling: null count and distinct count per column, plus min/max/exact-mean for the numeric column — the data-quality scan every pipeline runs before training",
      (s, dir) => {
        val o = T.orders(s, dir)
        // one aggregate pass computes every column's profile; the head()
        // collects a single summary row, melted to one row per column.
        // Numeric stats: raw-double min/max are bit-safe, the mean is the
        // exact decimal sum divided in double (both engine-portable).
        val r = o.agg(
          count(lit(1)).as("n"),
          count(col("o_custkey")).as("nn_cust"),
          countDistinct(col("o_custkey")).as("nd_cust"),
          count(col("o_orderstatus")).as("nn_status"),
          countDistinct(col("o_orderstatus")).as("nd_status"),
          count(col("o_totalprice")).as("nn_price"),
          countDistinct(col("o_totalprice")).as("nd_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          (sum(dec(col("o_totalprice"), 2)).cast("double")
            / count(col("o_totalprice")).cast("double")).as("mean_price")).head()
        val s0 = s
        import s0.implicits._
        Seq(
          ("o_custkey", r.getAs[Long]("n") - r.getAs[Long]("nn_cust"),
            r.getAs[Long]("nd_cust"),
            Option.empty[Double], Option.empty[Double], Option.empty[Double]),
          ("o_orderstatus", r.getAs[Long]("n") - r.getAs[Long]("nn_status"),
            r.getAs[Long]("nd_status"),
            Option.empty[Double], Option.empty[Double], Option.empty[Double]),
          ("o_totalprice", r.getAs[Long]("n") - r.getAs[Long]("nn_price"),
            r.getAs[Long]("nd_price"),
            Some(r.getAs[Double]("min_price")), Some(r.getAs[Double]("max_price")),
            Some(r.getAs[Double]("mean_price"))))
          .toDF("col_name", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
          .orderBy(col("col_name"))
      },
      """SELECT col_name, n_null, n_distinct, min_v, max_v, mean_v FROM (
        |  SELECT 'o_custkey' AS col_name,
        |    COUNT(*) - COUNT(o_custkey) AS n_null,
        |    COUNT(DISTINCT o_custkey) AS n_distinct,
        |    CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v,
        |    CAST(NULL AS DOUBLE) AS mean_v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus), NULL, NULL, NULL FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
        |    COUNT(DISTINCT o_totalprice),
        |    MIN(o_totalprice), MAX(o_totalprice),
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(COUNT(o_totalprice) AS DOUBLE) FROM orders)
        |ORDER BY col_name""".stripMargin),

    "c17_histogram" -> Q(
      "Equi-width histogram of order values: exact integer bucketing over a fixed range",
      (s, dir) => T.orders(s, dir)
        // bucket = floor(price / 50000) capped at 11: integer-exact on both
        // engines for 2-decimal monetary doubles
        .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(11.0))
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("bucket")),
      """SELECT LEAST(FLOOR(o_totalprice / 50000.0), 11)::BIGINT AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin),

    "e9_full_outer" -> Q(
      "Full outer join of two aggregates: per-customer order counts vs per-user event counts, nulls where either side is absent",
      (s, dir) => {
        val o = T.orders(s, dir).groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("n_orders"))
        val e = T.events(s, dir).groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("n_events"))
        o.join(e, Seq("k"), "full_outer")
          .select(col("k"), col("n_orders"), col("n_events"))
          .orderBy(col("k"))
      },
      """WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1),
        |e AS (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1)
        |SELECT COALESCE(o.k, e.k) AS k, n_orders, n_events
        |FROM o FULL OUTER JOIN e ON o.k = e.k
        |ORDER BY k""".stripMargin),

    "g3_time_bucket" -> Q(
      "Time bucketing: events into 15-minute buckets by exact integer epoch arithmetic (the batch twin of the streaming tumbling window)",
      (s, dir) => T.events(s, dir)
        .select(date_trunc("second", col("ts")).as("ts_sec"),
          col("event_type"), col("value"))
        .groupBy((floor(unix_timestamp(col("ts_sec")) / 900.0) * 900).cast("long")
          .as("bucket_sec"))
        .agg(count(lit(1)).as("n"),
          decSum(col("value"), 4).as("total_value"))
        .orderBy(col("bucket_sec")),
      // FLOOR-division epoch bucketing, spelled identically on both sides:
      // Spark `div` truncates toward zero while DuckDB `//` floors, so the
      // two diverge on pre-1970 (negative-epoch) timestamps. floor(x/900.0)
      // is exact for integer x < 2^53: the double quotient can only land on
      // an integer when x is an exact multiple of 900.
      """SELECT CAST(floor(epoch(date_trunc('second', ts))::BIGINT / 900.0) * 900 AS BIGINT) AS bucket_sec,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY bucket_sec""".stripMargin),

    "c15_unpivot" -> Q(
      "Unpivot/melt: per-day event-type count columns back into (day, event_type, n) long form",
      (s, dir) => {
        val wide = T.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .pivot("event_type", Seq("click", "view", "purchase"))
          .agg(count(lit(1)))
          .na.fill(0L)
        wide.unpivot(
          Array(col("day")),
          Array(col("click"), col("view"), col("purchase")),
          "event_type", "n")
          .orderBy(col("day"), col("event_type"))
      },
      // oracle as UNION ALL — the portable spelling of unpivot
      """WITH wide AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    COUNT(*) FILTER (event_type = 'click') AS click,
        |    COUNT(*) FILTER (event_type = 'view') AS view,
        |    COUNT(*) FILTER (event_type = 'purchase') AS purchase
        |  FROM events GROUP BY 1)
        |SELECT day, event_type, n FROM (
        |  SELECT day, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT day, 'view', view FROM wide
        |  UNION ALL SELECT day, 'purchase', purchase FROM wide)
        |ORDER BY day, event_type""".stripMargin),

    "sub1_above_avg" -> Q(
      "Scalar-subquery shape: orders priced above their customer's mean order value, counted per segment (decorrelated to an aggregate+join)",
      (s, dir) => {
        // The correlated form ("WHERE o_totalprice > (SELECT AVG ... WHERE
        // same customer)") decorrelates to exactly this: per-customer
        // exact mean, joined back, filtered. The mean is decimal-exact
        // then double — identical on both sides.
        val o = T.orders(s, dir)
        val avgs = o.groupBy(col("o_custkey").as("k"))
          .agg((sum(dec(col("o_totalprice"), 2)).cast("double")
            / count(lit(1)).cast("double")).as("cust_avg"))
        o.join(avgs, col("o_custkey") === col("k"))
          .filter(col("o_totalprice") > col("cust_avg"))
          .join(broadcast(T.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_above"))
          .orderBy(col("c_mktsegment"))
      },
      """WITH avgs AS (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS cust_avg
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment, COUNT(*) AS n_above
        |FROM orders
        |JOIN avgs ON o_custkey = k
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > cust_avg
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "graph_pagerank" -> Q(
      "PageRank-style graph centrality (operators.GraphRank): 5 fixed power-iteration rounds over the part co-purchase graph in exact fixed-point BIGINT arithmetic — the CommonCrawl/CCNet domain-ranking shape a curation pipeline joins onto its corpus as a per-source quality prior; integer mass makes the result bit-identical at any cluster size (and DuckDB-oracle-checkable, iterations unrolled as chained CTEs)",
      (s, dir) => {
        // Undirected co-purchase graph: parts sharing an order, both
        // directions. Per-order pair fanout is k² with k ≤ ~7 lineitems
        // per order — bounded, scan-shaped at any scale. One groupBy
        // builds the per-order part set (collect_set dedups inside the
        // same shuffle the old `distinct` spent on its own) and pair
        // generation is a row-local double explode over the ≤7-element
        // set — no self-join. Cross-order pair dedup is powerIteration's
        // own adjacency-set aggregation (set semantics), so no separate
        // pair-distinct shuffle here at all.
        val e = T.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(col("pks")).as("src"), col("pks"))
          .select(col("src"), explode(col("pks")).as("dst"))
          .filter(col("src") =!= col("dst"))
        graft.operators.GraphRank.powerIteration(e, iters = 5)
          .orderBy(col("rank").desc, col("id"))
          .limit(25)
          .select(col("id").as("part_id"), col("rank"))
      },
      PageRankOracleSql),

    "graph_triangles" -> Q(
      "Triangle count + global clustering coefficient of the part co-purchase graph, by DEGREE-ORDERED edge orientation: every edge points from its lower-(degree,id) endpoint, so each triangle is enumerated exactly once at its minimum-rank apex and the wedge join's fan-out is bounded by the orientation (out-degree ≤ √(2|E|)) — the skew-resistant form that survives hub nodes at 100 TB, where an id-ordered join would square a 10^6-degree hub",
      (s, dir) => {
        // Same no-self-join edge derivation as graph_pagerank: per-order
        // part set, row-local pair explode, one cross-order distinct.
        val pairs = T.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(col("pks")).as("a"), col("pks"))
          .select(col("a"), explode(col("pks")).as("b"))
          .filter(col("a") < col("b"))
          .distinct()
          .persist()
        val deg = pairs
          .select(explode(array(col("a"), col("b"))).as("id"))
          .groupBy(col("id")).agg(count(lit(1)).as("d"))
          .persist()
        val lowFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        // o and adj are each consumed by MULTIPLE plan branches (adj's two
        // broadcast builds for the u- and v-side joins differ by alias, so
        // exchange reuse cannot dedup them): unpersisted, every broadcast
        // build re-ran the pairs⋈deg orientation joins — measured as ~5
        // concurrent 2-s broadcast jobs at sf0.1 (job-time sum 22 s for an
        // 8.8 s wall). Persisting both caches |E| (u,v) longs and |V|
        // adjacency arrays — the same frames the computation already
        // materializes once — and drops the rebuild jobs (guide §5:
        // persist exactly the reused-and-expensive frames).
        val o = pairs
          .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
          .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
          .select(when(lowFirst, col("a")).otherwise(col("b")).as("u"),
            when(lowFirst, col("b")).otherwise(col("a")).as("v"))
          .persist()
        // Edge-iterator with sorted-adjacency intersection: triangles
        // through edge (u,v) = |N⁺(u) ∩ N⁺(v)|, a row-local codegen'd
        // merge over two ≤√(2|E|)-element sorted arrays — the wedge set
        // is never MATERIALIZED (the oriented three-way self-join this
        // replaces shuffled every wedge; measured 2.1s+1.7s of its
        // runtime at sf0.1 was exactly that wedge exchange)
        val adj = o.groupBy(col("u"))
          .agg(sort_array(collect_list(col("v"))).as("nbrs"))
          .persist()
        val tri = o
          .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
          .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
          .agg(sum(graft.functions.ArrayFunctions
            .sortedIntersectSize(col("nu"), col("nv")).cast("long"))
            .as("n_triangles"))
          .select(coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        val stats = deg.agg(
          count(lit(1)).as("n_vertices"),
          (sum(col("d")) / 2).cast("long").as("n_edges"),
          sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
        // 1-row × 1-row: the closed-form clustering coefficient from
        // exact integer counts, one double division — bit-portable
        stats.crossJoin(broadcast(tri))
          .select(col("n_vertices"), col("n_edges"), col("n_triangles"),
            col("n_wedges"),
            ((col("n_triangles") * 3).cast("double") /
              col("n_wedges").cast("double")).as("clustering"))
      },
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.pk AS a, b.pk AS b
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY id),
        |tri AS (
        |  -- id-ordered enumeration: provably the same count as the
        |  -- engine's degree-ordered orientation (each triangle once)
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
        |    CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
        |    CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM deg)
        |SELECT n_vertices, n_edges, n_triangles, n_wedges,
        |  CAST(n_triangles * 3 AS DOUBLE) / CAST(n_wedges AS DOUBLE) AS clustering
        |FROM st, tri""".stripMargin),

    "graph_lpa_communities" -> Q(
      "Community detection by synchronous label propagation (Raghavan et " +
        "al. 2007) over the part co-purchase graph — 3 fixed rounds, each " +
        "vertex adopts its neighbors' most frequent label with ties to the " +
        "smallest: the web-graph community pass a curation pipeline uses " +
        "to group crawl domains before per-community quality priors. " +
        "Synchronous + (count desc, label asc) tie-break makes every round " +
        "deterministic and engine-replayable; each round is two ids-only " +
        "aggregations (no window), rounds are bounded like graph_pagerank, " +
        "and the frames never carry more than (vertex, label, count)",
      (s, dir) => {
        // Edge layout (optimization guide §2.4 "remove shuffles outright"):
        // the pair dedup is a src-keyed collect_set — ONE exchange keyed
        // on src, dst sets deduped MAP-SIDE inside the partial aggregate
        // (a keyless distinct shuffled (src,dst)-keyed; a bare
        // repartition(src) shuffled raw un-deduped pairs and measured
        // slower in the shared bench). Hash partitioning on src satisfies
        // round 1's groupBy(src) and every round's groupBy(src,lab)/
        // groupBy(src), so with the label side riding a broadcast (AQE's
        // choice at any |V| that fits; the label table is (vertex,label)
        // longs) the fixed rounds run without re-shuffling the persisted
        // |E|-row edge cache. Measured at sf0.1 (isolated bench): 4.2 →
        // 1.9 s. At a |V| too big to broadcast, AQE falls back to a
        // shuffled join on dst — the per-round shuffles the unpartitioned
        // layout paid anyway. A hub vertex whose adjacency set exceeds
        // executor memory needs the (src,dst)-keyed distinct instead
        // (one-line revert); co-purchase degree is catalog-bounded.
        val edges = T.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
          .select(explode(col("pks")).as("src"), col("pks"))
          .select(col("src"), explode(col("pks")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .groupBy(col("src")).agg(collect_set(col("dst")).as("ds"))
          .select(col("src"), explode(col("ds")).as("dst"))
          .persist()
        // round 1 peeled: initial labels are the vertex ids themselves, so
        // every neighbor label is distinct (all counts 1) and the argmax
        // tie-break reduces to min(dst) — one aggregation, no join
        var labels = edges.groupBy(col("src"))
          .agg(min(col("dst")).as("lab"))
          .select(col("src").as("v"), col("lab"))
        for (_ <- 2 to 3) {
          labels = edges
            .join(labels.select(col("v").as("dst"), col("lab")), Seq("dst"))
            .groupBy(col("src"), col("lab")).agg(count(lit(1)).as("c"))
            // argmax by (c, -lab): most frequent neighbor label, ties to
            // the smallest label — one struct-max aggregation, no window
            .groupBy(col("src"))
            .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
            .select(col("src").as("v"), (-col("m.nl")).as("lab"))
        }
        labels.groupBy(col("lab").as("community"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("n_members").desc, col("community"))
          .limit(25)
      },
      LpaOracleSql),

    "report_k_anonymity" -> Q(
      "k-anonymity privacy audit over the quasi-identifier (nation, market " +
        "segment) — the training-data governance check before releasing or " +
        "training on records with demographic columns (Sweeney 2002): every " +
        "QI equivalence class with its size k, an at-risk flag (k < 5, the " +
        "conventional re-identification threshold), and each class's share " +
        "of the table. One grouped scan; the total joins back as a 1-row " +
        "broadcast, so the audit is a single aggregation pass at any scale",
      (s, dir) => {
        val grp = T.customer(s, dir)
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("k"))
        val total = T.customer(s, dir).agg(count(lit(1)).as("n_total"))
        grp.crossJoin(broadcast(total))
          .select(col("c_nationkey"), col("c_mktsegment"), col("k"),
            (col("k") < 5L).as("at_risk"),
            (col("k").cast("double") / col("n_total").cast("double"))
              .as("share"))
          .orderBy(col("k"), col("c_nationkey"), col("c_mktsegment"))
      },
      """WITH grp AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS k
        |  FROM customer GROUP BY c_nationkey, c_mktsegment),
        |tot AS (SELECT COUNT(*) AS n_total FROM customer)
        |SELECT c_nationkey, c_mktsegment, k,
        |  k < 5 AS at_risk,
        |  CAST(k AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        |FROM grp CROSS JOIN tot
        |ORDER BY k, c_nationkey, c_mktsegment""".stripMargin),
  )

  /** DuckDB oracle for `graph_lpa_communities`: the 3 synchronous LPA
    * rounds unrolled as chained CTEs; argmax by (count desc, label asc)
    * via lexicographic min over {-c, lab} structs — identical to the
    * engine's struct-max aggregation. */
  private lazy val LpaOracleSql: String = {
    def round(k: Int, prev: String): String =
      s"""l$k AS (
         |  SELECT src AS v, (min({'nc': -c, 'lab': lab})).lab AS lab FROM (
         |    SELECT e.src, p.lab, CAST(COUNT(*) AS BIGINT) AS c
         |    FROM e JOIN $prev p ON p.v = e.dst
         |    GROUP BY e.src, p.lab)
         |  GROUP BY src)""".stripMargin
    val rounds = (1 to 3).map(k => round(k, if (k == 1) "l0" else s"l${k - 1}"))
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk),
       |l0 AS (SELECT DISTINCT src AS v, src AS lab FROM e),
       |${rounds.mkString(",\n")}
       |SELECT lab AS community, COUNT(*) AS n_members FROM l3
       |GROUP BY lab ORDER BY n_members DESC, community LIMIT 25""".stripMargin
  }

  /** DuckDB oracle for `graph_pagerank`: the 5 power-iteration rounds
    * unrolled as chained CTEs, floor-division (`//`) fixed-point BIGINT
    * arithmetic identical to [[graft.operators.GraphRank]] — SUM(BIGINT)
    * widens to HUGEINT in DuckDB, cast back before the damping multiply
    * so both engines do the same 64-bit math. */
  private lazy val PageRankOracleSql: String = {
    def iter(k: Int, prev: String): String =
      s"""it$k AS (
         |  SELECT e.dst AS id,
         |    (15 * (1000000000000 // nn.n)) // 100
         |      + (85 * CAST(SUM(r.rank // d.outdeg) AS BIGINT)) // 100 AS rank
         |  FROM e
         |  JOIN $prev r ON e.src = r.id
         |  JOIN deg d ON e.src = d.id
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    val iters = (1 to 5).map(k => iter(k, if (k == 1) "r0" else s"it${k - 1}"))
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk),
       |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS outdeg
       |        FROM e GROUP BY src),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
       |r0 AS (SELECT id, 1000000000000 // n AS rank FROM deg CROSS JOIN nn),
       |${iters.mkString(",\n")}
       |SELECT id AS part_id, CAST(rank AS BIGINT) AS rank FROM it5
       |ORDER BY rank DESC, part_id LIMIT 25""".stripMargin
  }
}
