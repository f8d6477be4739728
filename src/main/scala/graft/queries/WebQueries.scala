package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level curation operators — the CommonCrawl/CCNet front door of a
  * training-data pipeline: URL canonicalization, URL-level dedup (the
  * cheapest dedup rung, upstream of content MinHash), and the per-domain
  * prior join (CCNet ranks domains and joins the rank onto every page).
  *
  * The documents table carries no URL column, so each doc gets a
  * DETERMINISTIC synthetic raw URL derived from `doc_id` alone (the
  * multimodal_decode_fixed posture: engine and oracle restate the same
  * closed-form synth). The synth deliberately exercises every
  * canonicalization rule: scheme/host case, www prefix, default vs
  * explicit ports, trailing slash, fragments, utm_* tracking params, and
  * param reordering — with planted collisions (doc_id and doc_id+300
  * agree on every canon-relevant residue when both fall in the same
  * port/query classes), so `dedup_url` finds real groups at every SF.
  *
  * Everything is built-in string/array functions (codegen'd, row-local):
  * at 100 TB canonicalization is scan-bandwidth-bound, `dedup_url` is one
  * hash-partitioned window on the canon key, and the domain prior is a
  * bounded-cardinality aggregate broadcast back onto the corpus.
  */
object WebQueries {

  /** The lcm of every canon-relevant residue in the synth (25·10·3·50·
    * 7·4·2·5·8 collapse to lcm 4200): without a block component, TWO
    * pages could only ever share a canonical URL via these residues, so
    * the distinct-key space would be bounded at 4200 and dup GROUPS
    * would stop growing past ~4200 docs (caught measuring the 1000×
    * decade — group count froze). The `/b<doc_id div 4200>` path
    * segment gives each 4200-id block its own key space: collision
    * density per block matches the small-SF fixture, group count scales
    * linearly, and group SIZE stays bounded (≤ 14 = 4200/300) — the
    * realistic regime, where URL dup groups are small however large the
    * crawl. */
  private val UrlBlock = 4200

  /** Deterministic synthetic raw URL for a document id. */
  private[graft] def rawUrlCol(d: Column): Column = {
    def m(k: Int): Column = pmod(d, lit(k))
    val hostCore = concat(lit("s"), m(25).cast("string"))
    val block = floor(d / UrlBlock).cast("long")
    concat(
      when(m(3) === 0, "http://").when(m(3) === 1, "https://")
        .otherwise("HTTPS://"),
      when(m(2) === 0, "www.").otherwise(""),
      when(m(5) === 0, upper(hostCore)).otherwise(hostCore),
      lit("."), lit("dom"), m(10).cast("string"), lit("."),
      when(m(3) === 0, "com").when(m(3) === 1, "org").otherwise("net"),
      when(m(7) === 0, when(m(3) === 0, ":80").otherwise(":443"))
        .when(m(7) === 1, ":8080").otherwise(""),
      lit("/b"), block.cast("string"),
      lit("/p/"), m(50).cast("string"),
      when(m(4) === 0, "/").otherwise(""),
      when(m(4) === 0, "?utm_source=feed&x=1")
        .when(m(4) === 1, "?x=1&utm_medium=a")
        .when(m(4) === 2, "?x=1&a=2").otherwise(""),
      when(m(8) === 0, "#frag").otherwise(""))
  }

  // Canonicalization pieces, built on substring_index — a TOTAL plain
  // string scan (no regex, no ANSI out-of-bounds throw on malformed
  // records, so one bad URL can never kill a streaming drain). Each
  // piece is parameterized by its IMMEDIATE input, never by the raw URL:
  // the one-expression composition (`canonicalize`) re-embeds upstream
  // trees multiplicatively (the raw synth appeared hundreds of times in
  // the gate query's plan — janino paid seconds per codegen), so every
  // corpus-sized path goes through [[withUrlParts]], which stages each
  // piece ONCE as a named column (CollapseProject keeps multi-use
  // non-cheap aliases materialized). "First occurrence" semantics
  // throughout (substr-from-length arithmetic, never the -1
  // last-occurrence form) so the DuckDB twins' string_split(...)[1]/[2]
  // match on any input.
  private def noFrag(raw: Column): Column = substring_index(raw, "#", 1)
  /** Scheme-less input is treated as http. */
  private def schemeFromU(u: Column): Column =
    when(u.contains("://"), lower(substring_index(u, "://", 1)))
      .otherwise("http")
  private def restFromU(u: Column): Column =
    when(u.contains("://"),
      u.substr(length(substring_index(u, "://", 1)) + 4, length(u)))
      .otherwise(u)
  /** Authority ends at the first '/' OR '?' (fragments are already
    * stripped): a path-less URL carrying a query (`http://h.com?x=1`)
    * must not swallow the query into the host. The twin's c2 applies the
    * same two-stage split. */
  private def hostportFromRest(rest: Column): Column =
    substring_index(substring_index(rest, "/", 1), "?", 1)
  private def pathqFrom(rest: Column, hp: Column): Column =
    rest.substr(length(hp) + 1, length(rest))
  private def hostFromHp(hp: Column): Column = {
    val h0 = lower(substring_index(hp, ":", 1))
    when(h0.startsWith("www."), h0.substr(lit(5), length(h0))).otherwise(h0)
  }
  /** Port suffix with scheme-default ports (:80 http, :443 https)
    * stripped; non-default ports survive. */
  private def portFrom(scheme: Column, hp: Column): Column = {
    val p0 = when(hp.contains(":"),
      concat(lit(":"),
        hp.substr(length(substring_index(hp, ":", 1)) + 2, length(hp))))
      .otherwise("")
    when(scheme === "http" && p0 === ":80", "")
      .when(scheme === "https" && p0 === ":443", "")
      .otherwise(p0)
  }
  /** Path with a trailing slash stripped (except the bare root). */
  private def pathFromPathq(pathq: Column): Column = {
    val p = substring_index(pathq, "?", 1)
    when(p.endsWith("/") && length(p) > 1, p.substr(lit(1), length(p) - 1))
      .otherwise(p)
  }
  /** Query string with utm_* tracking params dropped and the survivors
    * sorted — parameter ORDER never distinguishes two URLs. Input is
    * everything after the first '?' (substr past the end yields ''). */
  private def sortedQueryFrom(pathq: Column): Column = {
    val q = pathq.substr(
      length(substring_index(pathq, "?", 1)) + 2, length(pathq))
    array_join(
      array_sort(filter(split(q, "&"),
        p => !p.startsWith("utm_") && p =!= "")), "&")
  }
  private def canonFrom(scheme: Column, host: Column, port: Column,
      pth: Column, qs: Column): Column =
    concat(scheme, lit("://"), host, port, pth,
      when(qs === "", "").otherwise(concat(lit("?"), qs)))

  /** Stages the URL parse ONCE per row as named columns `scheme`,
    * `host`, `port`, `pth`, `qs`, `canon_url` (the DuckDB twin's c0–c6
    * chain, engine-side). Every corpus-sized query and the streaming
    * screen go through here — see the class note on expression-tree
    * blowup for why composition into one Column is reserved for
    * fixture-sized frames. */
  private[graft] def withUrlParts(df: DataFrame, raw: Column): DataFrame =
    df.withColumn("_u", noFrag(raw))
      .withColumn("_scheme", schemeFromU(col("_u")))
      .withColumn("_rest", restFromU(col("_u")))
      .withColumn("_hp", hostportFromRest(col("_rest")))
      .withColumn("_pathq", pathqFrom(col("_rest"), col("_hp")))
      .withColumn("scheme", col("_scheme"))
      .withColumn("host", hostFromHp(col("_hp")))
      .withColumn("port", portFrom(col("_scheme"), col("_hp")))
      .withColumn("pth", pathFromPathq(col("_pathq")))
      .withColumn("qs", sortedQueryFrom(col("_pathq")))
      .withColumn("canon_url", canonFrom(col("scheme"), col("host"),
        col("port"), col("pth"), col("qs")))
      .drop("_u", "_scheme", "_rest", "_hp", "_pathq")

  /** The full canonical form as ONE Column — for fixture-sized frames
    * (specs, point checks) only; corpus paths use [[withUrlParts]].
    * Composed from the SAME piece functions, so the two forms cannot
    * drift. Idempotent (spec-pinned). */
  private[graft] def canonicalize(raw: Column): Column = {
    val u = noFrag(raw)
    val rest = restFromU(u)
    val hp = hostportFromRest(rest)
    val pathq = pathqFrom(rest, hp)
    canonFrom(schemeFromU(u), hostFromHp(hp), portFrom(schemeFromU(u), hp),
      pathFromPathq(pathq), sortedQueryFrom(pathq))
  }

  /** Canonical host from a raw URL (fixture-sized frames only). */
  private[graft] def hostOf(raw: Column): Column =
    hostFromHp(hostportFromRest(restFromU(noFrag(raw))))

  /** Appends the RefinedWeb-style gate features + verdict (`path_depth`,
    * `n_params`, `digit_frac`, `tracked`, `odd_port`, `pass`) to a
    * [[withUrlParts]]-staged frame carrying `raw_url`. ONE rule set shared
    * by the `url_quality_gate` registry row and the `url_screen` API verb
    * — the two surfaces cannot drift. Row-local built-ins throughout. */
  private[graft] def withGateFeatures(staged: DataFrame): DataFrame = {
    val p = col("pth"); val qs = col("qs")
    staged
      .withColumn("path_depth", (size(split(p, "/")) - 1).cast("long"))
      .withColumn("n_params", when(qs === "", 0L)
        .otherwise(size(split(qs, "&")).cast("long")))
      // empty canonical path (bare-host URL: http://example.com) would be
      // 0.0/0.0 -> NULL under non-ANSI Divide and the NULL would null the
      // `pass` conjunction — a path with no characters has no digits
      .withColumn("digit_frac",
        when(length(p) === 0, lit(0.0)).otherwise(
          (length(p) - length(regexp_replace(p, "[0-9]", ""))).cast("double")
            / length(p).cast("double")))
      .withColumn("tracked", col("raw_url").contains("utm_"))
      .withColumn("odd_port", col("port") =!= "")
      .withColumn("pass",
        !col("tracked") && col("n_params") <= 2 &&
          col("path_depth") <= 4 && col("digit_frac") <= 0.5)
  }

  /** Registered domain = last two host labels (the public-suffix
    * approximation that needs no suffix list); a single-label host is
    * its own domain — substring_index(…, -2) gives both behaviors
    * totally (no split array, no ANSI throw). */
  private[graft] def domainOf(host: Column): Column =
    substring_index(host, ".", -2)

  // ---------------------------------------------------------------- SQL

  /** DuckDB twin of the synthetic [[rawUrlCol]] alone, as a CTE
    * `raw(doc_id, n_chars, raw_url)` over `documents`. */
  private val SynthRawCte: String =
    // NOTE: continuation lines here must never START with "|" — query
    // strings that embed this fragment call .stripMargin again, which
    // would eat the first pipe of a leading "||" (so the concat operator
    // always trails the previous line).
    """raw AS (
      |  SELECT doc_id, n_chars,
      |    (CASE doc_id % 3 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://'
      |      ELSE 'HTTPS://' END) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
      |    (CASE WHEN doc_id % 5 = 0
      |      THEN upper('s' || CAST(doc_id % 25 AS VARCHAR))
      |      ELSE 's' || CAST(doc_id % 25 AS VARCHAR) END) ||
      |    '.dom' || CAST(doc_id % 10 AS VARCHAR) || '.' ||
      |    (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      ELSE 'net' END) ||
      |    (CASE WHEN doc_id % 7 = 0
      |      THEN (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END)
      |      WHEN doc_id % 7 = 1 THEN ':8080' ELSE '' END) ||
      |    '/b' || CAST(doc_id // 4200 AS VARCHAR) ||
      |    '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
      |    (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&x=1'
      |      WHEN 1 THEN '?x=1&utm_medium=a'
      |      WHEN 2 THEN '?x=1&a=2' ELSE '' END) ||
      |    (CASE WHEN doc_id % 8 = 0 THEN '#frag' ELSE '' END) AS raw_url
      |  FROM documents)""".stripMargin

  /** DuckDB twin of [[withUrlParts]] — the c0–c6 parse chain over ANY
    * `raw` CTE carrying `raw_url` (extra columns pass through the
    * `SELECT *`s). Ends in `c6(..., scheme, host, port, pth, qs)`. */
  private val CanonChainCtes: String =
    """c0 AS (SELECT *, string_split(raw_url, '#')[1] AS u FROM raw),
      |c1 AS (SELECT *,
      |         CASE WHEN contains(u, '://')
      |           THEN lower(string_split(u, '://')[1])
      |           ELSE 'http' END AS scheme,
      |         CASE WHEN contains(u, '://')
      |           THEN substr(u, length(string_split(u, '://')[1]) + 4)
      |           ELSE u END AS rest FROM c0),
      |c2 AS (SELECT *,
      |         string_split(string_split(rest, '/')[1], '?')[1] AS hostport
      |       FROM c1),
      |c3 AS (SELECT *, substr(rest, length(hostport) + 1) AS pathq FROM c2),
      |c4 AS (SELECT *, string_split(pathq, '?')[1] AS path0,
      |         CASE WHEN len(string_split(pathq, '?')) > 1
      |           THEN string_split(pathq, '?')[2] ELSE '' END AS qry FROM c3),
      |c5 AS (SELECT *, lower(string_split(hostport, ':')[1]) AS host0,
      |         CASE WHEN len(string_split(hostport, ':')) > 1
      |           THEN ':' || string_split(hostport, ':')[2]
      |           ELSE '' END AS port0 FROM c4),
      |c6 AS (SELECT *,
      |    CASE WHEN (scheme = 'http' AND port0 = ':80')
      |           OR (scheme = 'https' AND port0 = ':443')
      |      THEN '' ELSE port0 END AS port,
      |    CASE WHEN starts_with(host0, 'www.') THEN substr(host0, 5)
      |      ELSE host0 END AS host,
      |    CASE WHEN path0 LIKE '%/' AND length(path0) > 1
      |      THEN substr(path0, 1, length(path0) - 1) ELSE path0 END AS pth,
      |    COALESCE(array_to_string(list_sort(list_filter(
      |      string_split(qry, '&'),
      |      p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&'), '') AS qs
      |  FROM c5)""".stripMargin

  /** The canonical-URL reassembly expression over a c6 row. */
  private val CanonUrlSql: String =
    "scheme || '://' || host || port || pth || " +
      "CASE WHEN qs = '' THEN '' ELSE '?' || qs END"

  /** DuckDB twin of [[rawUrlCol]] + [[canonicalize]], as chained CTEs
    * ending in `canon(doc_id, n_chars, raw_url, canon_url, host)`. */
  private val CanonSqlCtes: String =
    s"""$SynthRawCte,
       |$CanonChainCtes,
       |canon AS (
       |  SELECT doc_id, n_chars, raw_url, $CanonUrlSql AS canon_url, host
       |  FROM c6)""".stripMargin

  // Mirrors the engine's substring_index(host, '.', -2) TOTALLY: a
  // single-label host is its own domain (the naive [len-1] index would
  // read [0] -> NULL), and scheme-less inputs never reach here broken
  // because c1 above restates the engine's http fallback. The synth never
  // emits either shape; the guards keep engine and twin equivalent on
  // arbitrary input, not just the fixture space.
  private val DomainSql =
    "CASE WHEN len(string_split(host, '.')) <= 1 THEN host ELSE " +
      "string_split(host, '.')[len(string_split(host, '.')) - 1] || '.' || " +
      "string_split(host, '.')[len(string_split(host, '.'))] END"

  /** The adversarial-shape fixture behind `url_gate_adversarial`: every
    * row is a URL shape outside the synthetic corpus's space, each
    * pinning one totality guard (see the query doc). Kept tiny and
    * literal so the DuckDB twin can restate it as VALUES. */
  private[graft] val AdversarialUrls: Seq[(Long, String)] = Seq(
    1L -> "example.com", // scheme-less, bare host, empty path
    2L -> "http://example.com", // empty path: the 0/0 digit_frac guard
    3L -> "https://localhost:8443/a/b", // single-label host, odd port
    4L -> "HTTP://WWW.Example.COM:80/x/", // case+www+default port+slash
    5L -> "example.com/p?b=2&a=1&utm_source=x", // scheme-less w/ query
    6L -> "http://single", // single-label host, empty path
    7L -> "http://digits.com/123456", // digit_frac 6/7 > 0.5 -> fail
    8L -> "https://deep.example.org/1/2/3/4/5/6", // depth 6 -> fail
    9L -> "http://example.com?x=1&utm_campaign=c", // query, NO path
    10L -> "http://h.com:8080/x?a=1&b=2&c=3", // odd port, 3 params
    11L -> "https://example.com:443/ok", // default https port stripped
    12L -> "http://example.com/#frag") // root slash + fragment

  private val AdversarialUrlsSql: String =
    AdversarialUrls.map { case (id, u) => s"($id, '$u')" }.mkString(", ")

  // ------------------------------------------------------------ queries

  val all: Seq[(String, Q)] = Seq(

    "url_canonicalize" -> Q(
      "URL canonicalization: case, www, default ports, trailing slash, fragments, utm_* strip, param sort — row-local built-ins, scan-bandwidth-bound at 100 TB",
      (s, dir) => {
        val staged = T.documents(s, dir)
          .withColumn("raw_url", rawUrlCol(col("doc_id")))
        withUrlParts(staged, col("raw_url"))
          .select(col("doc_id"), col("raw_url"), col("canon_url"),
            col("host"), domainOf(col("host")).as("domain"))
          .orderBy(col("doc_id"))
      },
      s"""WITH $CanonSqlCtes
         |SELECT doc_id, raw_url, canon_url, host, $DomainSql AS domain
         |FROM canon ORDER BY doc_id""".stripMargin),

    "dedup_url" -> Q(
      "URL-level dedup: group by canonical URL, keep-best by (n_chars DESC, doc_id ASC) — the cheapest dedup rung, one hash-partitioned window on the canon key",
      (s, dir) => {
        val w = Window.partitionBy("canon_url")
        withUrlParts(T.documents(s, dir), rawUrlCol(col("doc_id")))
          .select(col("doc_id"), col("n_chars"), col("canon_url"))
          .withColumn("rn", row_number().over(
            w.orderBy(col("n_chars").desc, col("doc_id"))))
          .withColumn("n_dups", count(lit(1)).over(w))
          .filter(col("rn") === 1 && col("n_dups") >= 2)
          .select(col("canon_url"), col("n_dups"),
            col("doc_id").as("kept_doc_id"),
            col("n_chars").as("kept_n_chars"))
          .orderBy(col("n_dups").desc, col("canon_url"))
      },
      s"""WITH $CanonSqlCtes,
         |r AS (
         |  SELECT canon_url, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY canon_url
         |      ORDER BY n_chars DESC, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY canon_url) AS n_dups
         |  FROM canon)
         |SELECT canon_url, n_dups, doc_id AS kept_doc_id,
         |  n_chars AS kept_n_chars
         |FROM r WHERE rn = 1 AND n_dups >= 2
         |ORDER BY n_dups DESC, canon_url""".stripMargin),

    "web_domain_prior" -> Q(
      "CCNet-style domain prior: per registered domain doc count / host count / mean length, broadcast-joined back onto each page — the quality prior join",
      (s, dir) => {
        val canon = withUrlParts(T.documents(s, dir),
          rawUrlCol(col("doc_id")))
          .select(col("doc_id"), col("n_chars"), col("host"))
          .withColumn("domain", domainOf(col("host")))
          // consumed by the prior build AND the page stream: persisting
          // the 4-column frame runs the parse chain once, and cache
          // substitution keeps the optimizer from re-walking the staged
          // canonicalization tree per branch (measured 1.2 s of the
          // query's 1.8 s wall was driver-side planning, jobsum 0.56 s)
          .persist()
        val prior = canon.groupBy("domain").agg(
          count(lit(1)).as("domain_docs"),
          countDistinct(col("host")).as("domain_hosts"),
          (sum(col("n_chars")).cast("double") /
            count(lit(1)).cast("double")).as("domain_avg_chars"))
        canon.filter(col("doc_id") < 200)
          .join(broadcast(prior), "domain")
          .select(col("doc_id"), col("domain"), col("domain_docs"),
            col("domain_hosts"), col("domain_avg_chars"))
          .orderBy(col("doc_id"))
      },
      s"""WITH $CanonSqlCtes,
         |cd AS (SELECT doc_id, n_chars, host, $DomainSql AS domain
         |       FROM canon),
         |prior AS (
         |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS domain_docs,
         |    CAST(COUNT(DISTINCT host) AS BIGINT) AS domain_hosts,
         |    CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |      AS domain_avg_chars
         |  FROM cd GROUP BY domain)
         |SELECT cd.doc_id, cd.domain, p.domain_docs, p.domain_hosts,
         |  p.domain_avg_chars
         |FROM cd JOIN prior p ON p.domain = cd.domain
         |WHERE cd.doc_id < 200
         |ORDER BY cd.doc_id""".stripMargin),

    "url_quality_gate" -> Q(
      "RefinedWeb-style URL quality gate: path depth, param count, path digit density, tracking/odd-port flags and the pass verdict — the URL-feature filter a crawl pipeline runs before fetching content",
      (s, dir) => {
        val staged = withUrlParts(
          T.documents(s, dir).withColumn("raw_url", rawUrlCol(col("doc_id"))),
          col("raw_url"))
        withGateFeatures(staged)
          .select(col("doc_id"), col("path_depth"), col("n_params"),
            col("digit_frac"), col("tracked"), col("odd_port"), col("pass"))
          .orderBy(col("doc_id"))
      },
      s"""WITH $CanonSqlCtes,
         |f AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(pth, '/')) - 1 AS BIGINT) AS path_depth,
         |    CASE WHEN qs = '' THEN CAST(0 AS BIGINT)
         |      ELSE CAST(len(string_split(qs, '&')) AS BIGINT) END AS n_params,
         |    CASE WHEN length(pth) = 0 THEN 0.0 ELSE
         |      CAST(length(pth) - length(regexp_replace(pth, '[0-9]', '', 'g'))
         |        AS DOUBLE) / CAST(length(pth) AS DOUBLE) END AS digit_frac,
         |    contains(raw_url, 'utm_') AS tracked,
         |    port <> '' AS odd_port
         |  FROM c6)
         |SELECT *,
         |  NOT tracked AND n_params <= 2 AND path_depth <= 4
         |    AND digit_frac <= 0.5 AS pass
         |FROM f ORDER BY doc_id""".stripMargin),

    "url_gate_adversarial" -> Q(
      "URL canonicalization + gate totality fence over shapes the synthetic corpus never emits — scheme-less, single-label host, empty path (the 0/0 digit_frac guard), query-without-path, port-carrying, root-slash URLs — the fixture is stated literally on BOTH sides so the totality guards are hash-fenced, not just code-reviewed (r13 verdict task #7)",
      (s, _) => {
        import s.implicits._
        withGateFeatures(
          withUrlParts(AdversarialUrls.toDF("doc_id", "raw_url"),
            col("raw_url")))
          .select(col("doc_id"), col("canon_url"), col("host"), col("port"),
            col("path_depth"), col("n_params"), col("digit_frac"),
            col("tracked"), col("odd_port"), col("pass"))
          .orderBy(col("doc_id"))
      },
      s"""WITH raw AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, raw_url
         |  FROM (VALUES $AdversarialUrlsSql) AS t(doc_id, raw_url)),
         |$CanonChainCtes,
         |f AS (
         |  SELECT doc_id, $CanonUrlSql AS canon_url, host, port,
         |    CAST(len(string_split(pth, '/')) - 1 AS BIGINT) AS path_depth,
         |    CASE WHEN qs = '' THEN CAST(0 AS BIGINT)
         |      ELSE CAST(len(string_split(qs, '&')) AS BIGINT) END AS n_params,
         |    CASE WHEN length(pth) = 0 THEN CAST(0 AS DOUBLE) ELSE
         |      CAST(length(pth) - length(regexp_replace(pth, '[0-9]', '', 'g'))
         |        AS DOUBLE) / CAST(length(pth) AS DOUBLE) END AS digit_frac,
         |    contains(raw_url, 'utm_') AS tracked,
         |    port <> '' AS odd_port
         |  FROM c6)
         |SELECT *,
         |  NOT tracked AND n_params <= 2 AND path_depth <= 4
         |    AND digit_frac <= 0.5 AS pass
         |FROM f ORDER BY doc_id""".stripMargin))
}
