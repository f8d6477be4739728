package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2 B (filters), C (aggregations), E (joins), G1 (incremental) and
  * the window-based A4 upsert-merge, expressed over the driver's synthetic
  * tables. Each entry carries a DuckDB oracle with identical semantics.
  *
  * Numeric policy (applies to every query here):
  *  - raw doubles pass through untouched (bit-identical in any engine);
  *  - computed monetary aggregates cast each term to DECIMAL(18,s) before
  *    summing, so the aggregation is exact decimal arithmetic and immune to
  *    float summation-order differences between engines; the FINAL value is
  *    cast to DOUBLE on both sides. A final DECIMAL output is a trap: a
  *    value with trailing zeros at its scale (e.g. sum of integer-valued
  *    quantities → "38244.00") stringifies differently as Decimal vs
  *    float64 depending on the reader path, and the driver's hash compare
  *    sees that as a mismatch. Casting the identical exact decimal to
  *    DOUBLE on both sides yields the same nearest double and the same
  *    canonical repr everywhere (verified: this was the only cause of the
  *    round-1 q1_agg/c9_rollup/e1_join_3way hash mismatches);
  *  - integer-ish aggregates are cast to BIGINT on both sides.
  *
  * Timestamp policy: `events.ts` is nanosecond-precision in parquet while
  * Spark's TimestampType is microseconds, so every comparison/sort/output
  * that involves `events.ts` goes through `date_trunc('second', ts)` on
  * BOTH sides, and range predicates are half-open ([lo, hi)) so truncation
  * can never flip a boundary row.
  */
object RelationalQueries {


  /** B6 (reference: scripts/migrate_providers.sql:101-105): NULL-guarded
    * optional predicates, built conditionally so Catalyst still pushes
    * every present filter down to the parquet scan. */
  def optionalFilters(
      events: DataFrame,
      eventType: Option[String],
      tsFrom: Option[String],
      tsTo: Option[String],
      minValue: Option[Double]): DataFrame = {
    var df = events
    eventType.foreach(t => df = df.filter(col("event_type") === lit(t)))
    tsFrom.foreach(f => df = df.filter(col("ts") >= to_timestamp(lit(f))))
    tsTo.foreach(t => df = df.filter(col("ts") < to_timestamp(lit(t))))
    minValue.foreach(v => df = df.filter(col("value") >= lit(v)))
    df
  }

  val all: Seq[(String, Q)] = Seq(

    "q1_agg" -> Q(
      "C1/C4-style pricing summary: filter + group-by multi-aggregate (TPC-H Q1 shape)",
      (s, dir) => {
        val li = T.lineitem(s, dir)
        li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSum(col("l_quantity"), 2).as("sum_qty"),
            decSum(col("l_extendedprice"), 4).as("sum_base_price"),
            decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    "b1_point_lookup" -> Q(
      "B1 point lookup by key (reference: src/database.py:212-221)",
      (s, dir) => T.orders(s, dir)
        .filter(col("o_orderkey") === 42L)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"),
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey = 42""".stripMargin),

    "b3_entity_timeline" -> Q(
      "B3 thread fetch: key filter + chronological order (reference: src/database.py:234-245)",
      (s, dir) => T.events(s, dir)
        .filter(col("user_id") === 7L)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          date_trunc("second", col("ts")).as("ts_sec"))
        .orderBy(col("event_id")),
      """SELECT event_id, user_id, event_type, value,
        |  date_trunc('second', ts) AS ts_sec
        |FROM events WHERE user_id = 7 ORDER BY event_id""".stripMargin),

    "b5_range_topk" -> Q(
      "B5 range filter + top-k by recency (reference: src/database.py:306-319)",
      (s, dir) => T.orders(s, dir)
        .filter(col("o_orderdate") > to_timestamp(lit("2000-06-01 00:00:00")))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
        .limit(20),
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders WHERE o_orderdate > TIMESTAMP '2000-06-01 00:00:00'
        |ORDER BY o_orderdate DESC, o_orderkey LIMIT 20""".stripMargin),

    "b6_optional_preds" -> Q(
      "B6 NULL-guarded optional predicates (reference: scripts/migrate_providers.sql:101-105)",
      (s, dir) => optionalFilters(T.events(s, dir),
        eventType = Some("click"),
        tsFrom = Some("2024-01-05 00:00:00"),
        tsTo = Some("2024-01-15 00:00:00"),
        minValue = None)
        .select("event_id", "user_id", "value")
        .orderBy(col("event_id")),
      """SELECT event_id, user_id, value
        |FROM events
        |WHERE event_type = 'click'
        |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin),

    "b9_recent_n" -> Q(
      "B9 recent-N scan with projection (reference: src/database.py:292-304)",
      (s, dir) => T.events(s, dir)
        .select(col("event_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts_sec"))
        .orderBy(date_trunc("second", col("ts")).desc, col("event_id").desc)
        .limit(50),
      """SELECT event_id, event_type, date_trunc('second', ts) AS ts_sec
        |FROM events
        |ORDER BY date_trunc('second', ts) DESC, event_id DESC LIMIT 50""".stripMargin),

    "c1_count" -> Q(
      "C1 total count (reference: src/database.py:264-271)",
      (s, dir) => T.lineitem(s, dir).agg(count(lit(1)).as("n")),
      "SELECT COUNT(*) AS n FROM lineitem"),

    "c2_filtered_count" -> Q(
      "C2 filtered count (reference: src/database.py:273-280)",
      (s, dir) => T.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n")),
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R'"),

    "c3_max_date" -> Q(
      "C3 global max — incremental-sync cursor (reference: src/database.py:282-290)",
      (s, dir) => T.orders(s, dir).agg(max(col("o_orderdate")).as("max_date")),
      "SELECT MAX(o_orderdate) AS max_date FROM orders"),

    "c4_group_stats" -> Q(
      "C4 per-group multi-aggregate view (reference: scripts/migrate_providers.sql:50-60)",
      (s, dir) => T.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          date_trunc("second", min(col("ts"))).as("first_ts"),
          date_trunc("second", max(col("ts"))).as("last_ts"),
          sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("n_high"))
        .orderBy(col("n").desc, col("event_type")),
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  date_trunc('second', MIN(ts)) AS first_ts,
        |  date_trunc('second', MAX(ts)) AS last_ts,
        |  CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, event_type""".stripMargin),

    "c5_storage_stats" -> Q(
      "C5 storage stats: count + conditional count + size sum (reference: src/markdown_storage.py:254-274)",
      (s, dir) => T.documents(s, dir)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en")),
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        |FROM documents""".stripMargin),

    "c7_patterns_day" -> Q(
      "C7 pattern analysis by day (reference: src/api/mcp_tools.py:204-224 — implemented for real)",
      (s, dir) => T.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type")),
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin),

    "c7_patterns_week" -> Q(
      "C7 pattern analysis by week (reference: src/llm_integration.py:309-326 group_by=week)",
      (s, dir) => T.events(s, dir)
        .groupBy(date_trunc("week", col("ts")).as("week"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("week")),
      """SELECT date_trunc('week', ts) AS week, COUNT(*) AS n,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1 ORDER BY week""".stripMargin),

    "c8_thread_stats" -> Q(
      "C8 per-thread summary stats (reference: src/llm_integration.py:164-172)",
      (s, dir) => T.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          date_trunc("second", min(col("ts"))).as("first_ts"),
          date_trunc("second", max(col("ts"))).as("last_ts"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id")),
      """SELECT user_id, COUNT(*) AS n,
        |  date_trunc('second', MIN(ts)) AS first_ts,
        |  date_trunc('second', MAX(ts)) AS last_ts,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    "c9_rollup" -> Q(
      "Rollup: multi-level aggregate lattice over (returnflag, linestatus) with grouping id",
      (s, dir) => T.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          decSum(col("l_quantity"), 2).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    "c10_pivot" -> Q(
      "Pivot: per-day event counts spread across fixed event-type columns",
      (s, dir) => T.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day")),
      """SELECT date_trunc('day', ts) AS day,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin),

    "e1_join_agg" -> Q(
      "E1 FK join + aggregate (reference: scripts/init_db.sql:40 emails⋈attachments)",
      (s, dir) => T.orders(s, dir)
        .join(T.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice"), 2).as("total_price"))
        .orderBy(col("c_mktsegment")),
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "e1_join_3way" -> Q(
      "E1 multi-way dimension join: customer⋈nation⋈region rollup",
      (s, dir) => T.customer(s, dir)
        .join(broadcast(T.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          decSum(col("c_acctbal"), 2).as("total_acctbal"))
        .orderBy(col("r_name")),
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    "e2_enrich_topk" -> Q(
      "E2 top-k + broadcast enrichment join (reference: src/llm_integration.py:49-57)",
      (s, dir) => {
        val top = T.orders(s, dir)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
        top.join(broadcast(T.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20) t
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin),

    "e3_anti_join" -> Q(
      "E3/B7 existence anti-join — dedup check as a set operation (reference: src/etl_pipeline.py:114-118)",
      (s, dir) => {
        val c = T.customer(s, dir)
        val o = T.orders(s, dir).select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    "e3_semi_join" -> Q(
      "E3 existence semi-join (EXISTS)",
      (s, dir) => {
        val c = T.customer(s, dir)
        val o = T.orders(s, dir)
          .filter(col("o_totalprice") > 400000.0)
          .select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin),

    "a4_upsert_latest" -> Q(
      "A4 upsert-merge: last-writer-wins dedup window (reference: src/database.py:88-94 ON CONFLICT DO UPDATE)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = T.events(s, dir)
          .withColumn("ts_sec", date_trunc("second", col("ts")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec").desc, col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type", "ts_sec")
          .orderBy(col("user_id"))
      },
      """SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts_sec
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY date_trunc('second', ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin),

    "a5_scd2" -> Q(
      "Slowly-changing-dimension type-2 history build over the upsert stream: each user's events become versioned rows with [valid_from, valid_to) ranges from a LEAD window (open range = current version) — the temporal-versioning complement to a4's last-writer-wins. One sessionize-shaped shuffle on the key; version chains are per-entity bounded",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))
        T.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_trunc("second", col("ts")).as("valid_from"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      """SELECT user_id, event_id, event_type,
        |  date_trunc('second', ts) AS valid_from,
        |  LEAD(date_trunc('second', ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('second', ts), event_id) AS valid_to,
        |  LEAD(date_trunc('second', ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('second', ts), event_id) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, valid_from, event_id""".stripMargin),

    "a5_scd2_asof" -> Q(
      "Point-in-time reconstruction over the SCD2 history: the table AS OF a literal timestamp — rows whose [valid_from, valid_to) range covers the instant (half-open, so a version closing exactly at T is excluded). Time travel as a plain range predicate over the history build: at scale the history is partition-pruned on valid_from before the window even matters",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val asOf = to_timestamp(lit("2024-01-20 00:00:00"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))
        T.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_trunc("second", col("ts")).as("valid_from"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
          .filter(col("valid_from") <= asOf &&
            (col("valid_to").isNull || col("valid_to") > asOf))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("valid_from"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id, event_id, event_type, valid_from FROM (
        |  SELECT user_id, event_id, event_type,
        |    date_trunc('second', ts) AS valid_from,
        |    LEAD(date_trunc('second', ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('second', ts), event_id) AS valid_to
        |  FROM events)
        |WHERE valid_from <= TIMESTAMP '2024-01-20 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20 00:00:00')
        |ORDER BY user_id""".stripMargin),

    "g1_incremental" -> Q(
      "G1 incremental sync: max-cursor + filtered re-read (reference: src/etl_pipeline.py:233-245)",
      (s, dir) => {
        val ev = T.events(s, dir)
        val cutoff = to_timestamp(lit("2024-01-20 00:00:00"))
        val maxSeen = ev.filter(col("ts") < cutoff)
          .agg(max(date_trunc("second", col("ts"))).as("cursor"))
        ev.withColumn("ts_sec", date_trunc("second", col("ts")))
          .crossJoin(broadcast(maxSeen))
          .filter(col("ts_sec") > col("cursor"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      """WITH cur AS (SELECT MAX(date_trunc('second', ts)) AS cursor
        |             FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
        |SELECT event_type, COUNT(*) AS n
        |FROM events, cur
        |WHERE date_trunc('second', ts) > cur.cursor
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    "e5_asof_join" -> Q(
      "As-of join: each event matched to its customer's latest order at-or-before the event time. Union + running-last window — the scalable as-of shape: one sort per key, zero join expansion (a theta-join would materialize |events|×|orders-per-user| rows before picking winners)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Interleave both sides on the key timeline: orders carry their
        // (date, key) payload, events carry null. Within a user, sort by
        // (time, side, o_orderkey) with orders (side=0) before events
        // (side=1) at equal time — that makes `last(payload ignore nulls)`
        // at each event row exactly the lexicographic max (o_orderdate,
        // o_orderkey) among orders with o_orderdate <= ts_sec: the
        // inclusive <= bound and the (date desc, key desc) tie-break of the
        // windowed-join formulation, without ever widening the data.
        // Shuffle volume is |events| + |orders| rows, grouped by user —
        // this is the plan that survives 100 TB (per-key timelines stay
        // independent; skewed users are single large sorted runs, not
        // cross products).
        val ev = T.events(s, dir)
          .select(col("user_id"), date_trunc("second", col("ts")).as("t"),
            lit(1).as("side"), col("event_id"),
            lit(null).cast("timestamp").as("o_orderdate"),
            lit(null).cast("long").as("o_orderkey"))
        val o = T.orders(s, dir)
          // a NULL o_orderdate can never satisfy the as-of predicate
          // (<= is NULL → dropped in the join formulation and the oracle);
          // without this filter it would sort NULLS FIRST and pose as the
          // earliest "order" in the running-last window
          .filter(col("o_orderdate").isNotNull)
          .select(col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
            lit(0).as("side"), lit(null).cast("long").as("event_id"),
            col("o_orderdate"), col("o_orderkey"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("side"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionByName(ev)
          .withColumn("m",
            last(when(col("side") === 0,
              struct(col("o_orderdate"), col("o_orderkey"))), ignoreNulls = true)
              .over(w))
          .filter(col("side") === 1 && col("m").isNotNull)
          .select(col("event_id"), col("user_id"),
            col("m.o_orderkey").as("o_orderkey"),
            col("m.o_orderdate").as("o_orderdate"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, o_orderkey, o_orderdate
        |FROM events JOIN orders
        |  ON user_id = o_custkey AND o_orderdate <= date_trunc('second', ts)
        |QUALIFY row_number() OVER (PARTITION BY event_id
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY event_id""".stripMargin),

    "e6_range_join" -> Q(
      "Range join: events bucketed into half-open time intervals (broadcast small side; interval trees / bucket-pruning at scale)",
      (s, dir) => {
        val intervals = s.createDataFrame(Seq(
          (1L, "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
          (2L, "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
          (3L, "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
          (4L, "2024-01-22 00:00:00", "2024-02-01 00:00:00")))
          .toDF("interval_id", "lo", "hi")
          .select(col("interval_id"),
            to_timestamp(col("lo")).as("lo"), to_timestamp(col("hi")).as("hi"))
        val ev = T.events(s, dir)
          .withColumn("ts_sec", date_trunc("second", col("ts")))
        ev.join(broadcast(intervals),
            col("ts_sec") >= col("lo") && col("ts_sec") < col("hi"))
          .groupBy(col("interval_id"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("interval_id"))
      },
      """WITH intervals(interval_id, lo, hi) AS (VALUES
        |  (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-08 00:00:00'),
        |  (CAST(2 AS BIGINT), TIMESTAMP '2024-01-08 00:00:00', TIMESTAMP '2024-01-15 00:00:00'),
        |  (CAST(3 AS BIGINT), TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00'),
        |  (CAST(4 AS BIGINT), TIMESTAMP '2024-01-22 00:00:00', TIMESTAMP '2024-02-01 00:00:00'))
        |SELECT interval_id, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events JOIN intervals
        |  ON date_trunc('second', ts) >= lo AND date_trunc('second', ts) < hi
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin),

    "g2_sessionize" -> Q(
      "Gap-based sessionization: lag + running sum over per-user event timelines (30-min inactivity gap)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val ev = T.events(s, dir)
          .withColumn("ts_sec", date_trunc("second", col("ts")))
          .withColumn("prev", lag(col("ts_sec"), 1).over(wOrd))
          .withColumn("brk",
            when(col("prev").isNull ||
              unix_timestamp(col("ts_sec")) - unix_timestamp(col("prev")) > 1800L, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        ev.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_sec")).as("session_start"),
            max(col("ts_sec")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      """WITH t AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS ts_sec,
        |    lag(date_trunc('second', ts)) OVER
        |      (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ts_sec,
        |    CASE WHEN prev IS NULL OR epoch(ts_sec) - epoch(prev) > 1800
        |      THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |sess AS (
        |  SELECT user_id, ts_sec,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM b)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events,
        |  MIN(ts_sec) AS session_start, MAX(ts_sec) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin),

    "c4_group_stats_approx" -> Q(
      "C4 scale variant: approx_count_distinct (HLL) replacing exact distinct — rows-only check (approx values are engine-specific by design)",
      (s, dir) => T.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type")),
      None),

    "f11_slug" -> Q(
      "F11 filename slug normalization (reference: src/markdown_storage.py:39-50)",
      (s, dir) => {
        val raw = regexp_replace(
          regexp_replace(lower(col("p_name")), "[^a-z0-9]+", "-"),
          "^-+|-+$", "")
        val slug = when(length(raw) === 0, lit("untitled"))
          .otherwise(substring(raw, 1, 50))
        T.part(s, dir).select(col("p_partkey"), slug.as("slug"))
          .orderBy(col("p_partkey"))
      },
      """SELECT p_partkey,
        |  CASE WHEN length(regexp_replace(regexp_replace(lower(p_name),
        |         '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g')) = 0
        |    THEN 'untitled'
        |    ELSE substr(regexp_replace(regexp_replace(lower(p_name),
        |         '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g'), 1, 50)
        |  END AS slug
        |FROM part ORDER BY p_partkey""".stripMargin),

    "f23_json_extract" -> Q(
      "F23 JSON metadata access (reference: src/database.py:74-76 JSONB read)",
      (s, dir) => T.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id")),
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin),

    "f7_date_roundtrip" -> Q(
      "F7/F12 RFC-2822-style date format + parse fallback chain (reference: src/providers/gmail/provider.py:244-258)",
      (s, dir) => {
        val tsSec = date_trunc("second", col("ts"))
        val fmt = date_format(tsSec, "EEE, dd MMM yyyy HH:mm:ss")
        // Parse back by dropping the "EEE, " day-name prefix: week-day
        // fields are format-only in Spark's parser, and RFC-2822 day names
        // are redundant anyway (reference provider falls back the same way).
        T.events(s, dir)
          .select(col("event_id"), fmt.as("rfc"),
            to_timestamp(substring(fmt, 6, 20), "dd MMM yyyy HH:mm:ss").as("parsed"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id,
        |  strftime(date_trunc('second', ts), '%a, %d %b %Y %H:%M:%S') AS rfc,
        |  strptime(substr(strftime(date_trunc('second', ts), '%a, %d %b %Y %H:%M:%S'), 6, 20),
        |           '%d %b %Y %H:%M:%S') AS parsed
        |FROM events ORDER BY event_id""".stripMargin),
  )
}
