package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII scrubbing and URL/domain analytics — the privacy-hygiene and
  * provenance stages of a web-scale training-data pipeline (detect + redact
  * emails/phones/IPs before training; aggregate quality signals per source
  * domain for crawl curation).
  *
  * The driver testdata carries no PII- or URL-shaped columns, so each query
  * derives a deterministic raw log line / URL from the `events` row INSIDE
  * the query — both engines build the identical string, and the oracle gate
  * then verifies the actual deliverable: that the regex detect / redact /
  * parse semantics agree cross-engine on every row. The regex constants are
  * shared between the Spark plan and the generated DuckDB SQL (single
  * source of truth), and are written in the common Java-regex/RE2 subset.
  *
  * Scale shape: both queries are stateless map work over the fact table
  * (codegen'd string expressions, no UDF) followed by — for the domain
  * rollup — one hash aggregation keyed on the domain; nothing shuffles the
  * raw text.
  */
object Privacy {

  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\+1-\d{3}-\d{4}"""
  val IpRe = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""

  /** The synthetic raw log line (Spark side; the oracle builds the same). */
  private def rawLine: Column = concat(
    lit("user "), col("user_id").cast("string"),
    lit(" <u"), col("user_id").cast("string"),
    lit("@example.com> phone +1-555-"),
    lpad((col("user_id") * 7 % 10000).cast("string"), 4, "0"),
    lit(" ip 10."), (col("user_id") % 256).cast("string"),
    lit(".0."), (col("event_id") % 256).cast("string"),
    lit(" type "), col("event_type"))

  /** PII detect + redact per event row: counts of email/phone/IP matches and
    * the scrubbed line (email → <EMAIL>, then phone → <PHONE>, then
    * IP → <IP> — fixed order, so the oracle replays it exactly).
    *
    * Counts are read back from the redaction stages as literal marker
    * occurrences — each replacement inserts its marker exactly once per
    * match, and no earlier replacement can create or destroy a later
    * pattern (markers carry no digits; the phone/IP patterns cannot occur
    * inside an email match here) — so the engine runs 3 regex passes
    * instead of 6 over the corpus. The oracle counts via
    * regexp_extract_all on the raw line, independently verifying the
    * equivalence. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    def markers(s: Column, m: String) =
      ((length(s) - length(replace(s, lit(m), lit("")))) / m.length).cast("int")
    Tables.fanOut(Tables.events(spark, dir)
        .select(col("event_id"), rawLine.as("raw")))
      .withColumn("s1", regexp_replace(col("raw"), EmailRe, "<EMAIL>"))
      .withColumn("s2", regexp_replace(col("s1"), PhoneRe, "<PHONE>"))
      .withColumn("s3", regexp_replace(col("s2"), IpRe, "<IP>"))
      .select(
        col("event_id"),
        markers(col("s1"), "<EMAIL>").as("n_emails"),
        markers(col("s2"), "<PHONE>").as("n_phones"),
        markers(col("s3"), "<IP>").as("n_ips"),
        col("s3").as("scrubbed"))
      .orderBy("event_id")
  }

  /** Canonical-URL dedup — the CommonCrawl-style URL normalization pass:
    * raw crawl URLs differ in case, `www.` prefixes, tracking params,
    * fragments, and trailing slashes while naming the same resource.
    * Canonicalize (strip query/fragment, strip one trailing slash,
    * lowercase the host, drop `www.` — path case is PRESERVED, paths are
    * case-sensitive) and collapse: per canonical URL, the event count,
    * the number of distinct raw spellings, and the kept (min) event id.
    * Only multi-spelling groups are emitted — the dedup report.
    *
    * The messy raw URL is derived deterministically from the events row
    * (4 spelling variants by event_id) so both engines see identical
    * input; the regex constants are shared Java/RE2-subset. One hash
    * aggregation on the canonical key — exact-dedup scale shape. */
  def urlCanonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val host = concat(lit("shard"), (col("user_id") % 20).cast("string"),
      lit(".example.com"))
    val path = concat(lit("/p/"), (col("event_id") % 997).cast("string"))
    val raw = when(col("event_id") % 4 === 0, concat(lit("https://"), host, path))
      .when(col("event_id") % 4 === 1, concat(lit("https://www."), host, path))
      .when(col("event_id") % 4 === 2, concat(lit("https://"), upper(host), path, lit("/")))
      .otherwise(concat(lit("https://"), host, path, lit("?utm_source=x#frag")))
    val noQuery = regexp_replace(col("url"), "[?#].*$", "")
    val noSlash = regexp_replace(noQuery, "/$", "")
    val hostPart = regexp_extract(noSlash, "^https://([^/]+)", 1)
    val pathPart = regexp_replace(noSlash, "^https://[^/]+", "")
    Tables.events(spark, dir)
      .select(col("event_id"), raw.as("url"))
      .withColumn("canonical_url",
        concat(lit("https://"),
          regexp_replace(lower(hostPart), "^www\\.", ""), pathPart))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("url")).as("n_spellings"),
        min(col("event_id")).as("keep_id"))
      .filter(col("n_spellings") > 1)
      .orderBy("canonical_url")
  }

  /** Host-extraction regex for [[urlDomains]] (group 1 = host). */
  val HostRe = """^https://([^/]+)/"""
  /** Registrable-domain suffix: last two dot-labels of the host. */
  val RegDomainRe = """([^.]+\.[^.]+)$"""

  /** Per-domain crawl rollup: derive a deterministic URL per event, parse
    * out host and registrable domain with shared regexes, aggregate events /
    * distinct users / mean value per host. The domain key is low-cardinality
    * relative to the events (the web-crawl reality), so the rollup is one
    * partial+final hash aggregation. */
  def urlDomains(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://shard"), (col("user_id") % 20).cast("string"),
      lit(".s"), (col("user_id") % 5).cast("string"),
      lit(".example.com/p/"), col("event_id").cast("string"),
      lit("?u="), col("user_id").cast("string"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), url.as("url"))
      .withColumn("host", regexp_extract(col("url"), HostRe, 1))
      .withColumn("reg_domain", regexp_extract(col("host"), RegDomainRe, 1))
      .groupBy("host", "reg_domain")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1)), 6).as("avg_value"))
      .orderBy("host")
  }

  /** Right-to-erasure (GDPR art. 17) propagation — the compliance pass every
    * user-data warehouse schedules: a deletion-request set (here a
    * deterministic 1-in-20 hash sample of customers, standing in for the
    * request table) cascades through the foreign-key chain
    * customer → orders → lineitem, and the audit report states per entity
    * how many rows the erasure removes vs keeps. The cascade is two LEFT
    * SEMI joins (each a key-only shuffle — row payloads never move) and the
    * report is three partial+final count aggregations; at 100 TB the request
    * set is broadcast and the scan-side semi joins turn into Bloom/DPP
    * filters. The kept tables themselves are the same relations minus the
    * semi join — materializing them is [[graft.sources.Sinks]] territory;
    * this query gates the SELECTION logic, where erasure bugs live. */
  def privacyErasure(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val delC = c.filter(
      graft.functions.Portable.hash60(col("k").cast("string")) % 20 === 0)
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val delO = o.join(delC, o("o_custkey") === delC("k"), "left_semi")
      .select(col("o_orderkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val delL = l.join(delO, l("l_orderkey") === delO("o_orderkey"), "left_semi")
    def stat(name: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
        .select(lit(name).as("entity"), col("n_total"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_kept"))
    stat("customer", c, delC)
      .unionByName(stat("orders", o, delO))
      .unionByName(stat("lineitem", l, delL))
      .orderBy("entity")
  }

  /** Minimum group size for [[privacyKAnonymity]]. */
  val KAnonymity = 10

  /** K-ANONYMITY audit over the quasi-identifier tuple (market segment,
    * nation) — the pre-release re-identification check a governed dataset
    * runs: every equivalence class of quasi-identifier values, its
    * population, its share of the segment, and its risk class (`unique` =
    * one individual, `below_k` = smaller than [[KAnonymity]], `ok`).
    * Suppression/generalization would act on the non-`ok` classes; this
    * relation IS the work list. Scale shape: one hash aggregation over the
    * entity table (classes ≤ |segments|×|nations|, never row-bounded) plus
    * one window over the class relation for the segment share. */
  def privacyKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("share_of_segment",
        round(col("n_customers").cast("double") /
          sum("n_customers").over(Window.partitionBy("c_mktsegment")), 6))
      .withColumn("risk",
        when(col("n_customers") === 1, "unique")
          .when(col("n_customers") < KAnonymity, "below_k")
          .otherwise("ok"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  /** K-anonymity ENFORCEMENT — the release step that acts on
    * [[privacyKAnonymity]]'s audit: quasi-identifier classes (segment ×
    * nation) of size ≥ k release as-is; below-k classes GENERALIZE the
    * more specific attribute (nation → '*') and release merged when the
    * merged class reaches k; segments whose merged below-k remainder is
    * STILL under k suppress those rows outright (released nowhere — the
    * '<suppressed>' row is release accounting, not data). Every released
    * class therefore has ≥ k members — the property a unit spec asserts
    * directly on the output.
    *
    * Scale shape: two hash aggregations over the CELL relation (segments ×
    * nations, not rows) plus a union — the audit's cost, not the table's.
    * The row-level released view is one broadcast join of this class map
    * back to the table (status ≠ suppressed), deliberately not part of the
    * gated output: classes are the decision surface. */
  def privacyKSuppression(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds the ok filter AND the below-k rollup
    val ok = cells.filter(col("n") >= KAnonymity)
      .select(col("c_mktsegment"), col("c_nationkey").cast("string").as("nation"),
        col("n").as("n_customers"), lit("ok").as("status"))
    val small = cells.filter(col("n") < KAnonymity)
      .groupBy(col("c_mktsegment")).agg(sum(col("n")).as("n"))
    val gen = small.filter(col("n") >= KAnonymity)
      .select(col("c_mktsegment"), lit("*").as("nation"),
        col("n").as("n_customers"), lit("generalized").as("status"))
    val sup = small.filter(col("n") < KAnonymity)
      .select(col("c_mktsegment"), lit("<suppressed>").as("nation"),
        col("n").as("n_customers"), lit("suppressed").as("status"))
    ok.unionByName(gen).unionByName(sup)
      .orderBy("c_mktsegment", "nation")
  }

  /** Minimum distinct sensitive values per equivalence class. */
  val LDiversity = 3

  /** Max total-variation distance between a class's sensitive distribution
    * and the table's (categorical t-closeness). */
  val TCloseness = 0.35

  /** The sensitive attribute for the diversity/closeness audits: an
    * account-balance band derived INSIDE the query (both engines build the
    * identical value — the pii_scrub pattern, since the testdata carries
    * no labeled sensitive column). */
  private def acctBand(c: Column): Column =
    when(c < 0, "debt").when(c < 4500, "low").otherwise("high")

  /** L-DIVERSITY audit: k-anonymity protects against re-identification but
    * not ATTRIBUTE disclosure — a class of 50 people who all share one
    * sensitive value leaks it to anyone who can place a target in the
    * class. Per quasi-identifier class (market segment, nation): size,
    * number of distinct sensitive bands, the dominant band's share, and
    * the risk flag (`homogeneous` = one value, `below_l` < [[LDiversity]]).
    * Scale shape: one hash aggregation to (class, band) cells — bounded by
    * |segments|×|nations|×|bands|, never row-bounded — then class-level
    * rollups over that tiny relation. */
  def privacyLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        acctBand(col("c_acctbal")).as("band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("band"))
      .agg(count(lit(1)).as("n"))
    cells.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("l_distinct"),
        round(max(col("n")).cast("double") / sum(col("n")), 6)
          .as("dominant_share"))
      .withColumn("risk",
        when(col("l_distinct") === 1, "homogeneous")
          .when(col("l_distinct") < LDiversity, "below_l")
          .otherwise("ok"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  /** T-CLOSENESS audit (categorical total-variation distance): even a
    * diverse class leaks when its sensitive DISTRIBUTION skews far from
    * the table's — membership in the class shifts an attacker's posterior.
    * Per class: tvd = ½·Σ_bands |p_class − p_global| over the FULL band
    * domain (absent bands contribute their global mass, so the class
    * relation is crossed with the 3-row band domain before the left
    * join), flagged against [[TCloseness]]. Per-band terms round at 6 and
    * sum in DECIMAL — the engine-wide order-independence discipline.
    * Scale shape: everything after the one cells aggregation is
    * bounded-cardinality relational algebra; the band domain and global
    * shares are broadcast. */
  def privacyTCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val c = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        acctBand(col("c_acctbal")).as("band"))
    val cells = c.groupBy(col("c_mktsegment"), col("c_nationkey"), col("band"))
      .agg(count(lit(1)).as("n"))
    val classes = cells.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(sum(col("n")).as("n_rows"))
    val global = c.groupBy(col("band")).agg(count(lit(1)).as("gn"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("gt"))))
      .select(col("band"), (col("gn").cast("double") / col("gt")).as("p_global"))
    val terms = classes
      .crossJoin(broadcast(global)) // class × full band domain
      .join(cells, Seq("c_mktsegment", "c_nationkey", "band"), "left")
      .select(col("c_mktsegment"), col("c_nationkey"), col("n_rows"),
        round(abs(coalesce(col("n"), lit(0L)).cast("double") / col("n_rows")
          - col("p_global")), 6).as("term"))
    terms.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(max(col("n_rows")).as("n_rows"),
        round(sum(col("term").cast(DecimalType(38, 18))).cast("double") / 2, 6)
          .as("tvd"))
      .withColumn("flag", when(col("tvd") > TCloseness, "far").otherwise("ok"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  // --- DuckDB oracles -------------------------------------------------------

  private val rawSql =
    """'user ' || user_id || ' <u' || user_id || '@example.com> phone +1-555-' ||
      | lpad((user_id * 7 % 10000)::VARCHAR, 4, '0') ||
      | ' ip 10.' || (user_id % 256) || '.0.' || (event_id % 256) ||
      | ' type ' || event_type""".stripMargin.replace("\n", "")

  val oracle: Map[String, String] = Map(
    "pii_scrub" ->
      s"""WITH r AS (SELECT event_id, $rawSql AS raw FROM events)
         |SELECT event_id,
         |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '$PhoneRe')) AS INTEGER) AS n_phones,
         |  CAST(len(regexp_extract_all(raw, '$IpRe')) AS INTEGER) AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(raw,
         |    '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'), '$IpRe', '<IP>', 'g') AS scrubbed
         |FROM r ORDER BY event_id""".stripMargin,

    "url_canonical_dedup" ->
      """WITH raw AS (
        |  SELECT event_id,
        |         CASE event_id % 4
        |           WHEN 0 THEN 'https://shard' || (user_id % 20) || '.example.com/p/' || (event_id % 997)
        |           WHEN 1 THEN 'https://www.shard' || (user_id % 20) || '.example.com/p/' || (event_id % 997)
        |           WHEN 2 THEN 'https://' || upper('shard' || (user_id % 20) || '.example.com') || '/p/' || (event_id % 997) || '/'
        |           ELSE 'https://shard' || (user_id % 20) || '.example.com/p/' || (event_id % 997) || '?utm_source=x#frag'
        |         END AS url
        |  FROM events
        |), c AS (
        |  SELECT event_id, url,
        |         regexp_replace(regexp_replace(url, '[?#].*$', ''), '/$', '') AS base
        |  FROM raw
        |), canon AS (
        |  SELECT event_id, url,
        |         'https://' ||
        |         regexp_replace(lower(regexp_extract(base, '^https://([^/]+)', 1)), '^www\.', '') ||
        |         regexp_replace(base, '^https://[^/]+', '') AS canonical_url
        |  FROM c
        |)
        |SELECT canonical_url, count(*) AS n_events,
        |       count(DISTINCT url) AS n_spellings,
        |       min(event_id) AS keep_id
        |FROM canon
        |GROUP BY canonical_url
        |HAVING count(DISTINCT url) > 1
        |ORDER BY canonical_url""".stripMargin,

    "privacy_erasure" ->
      """WITH delc AS (
        |  SELECT c_custkey FROM customer
        |  WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT % 20 = 0
        |), delo AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM delc)
        |), s AS (
        |  SELECT 'customer' AS entity,
        |         (SELECT count(*) FROM customer) AS n_total,
        |         (SELECT count(*) FROM delc) AS n_deleted
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem
        |          WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
        |  UNION ALL
        |  SELECT 'orders',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM delo)
        |)
        |SELECT entity, n_total, n_deleted, n_total - n_deleted AS n_kept
        |FROM s ORDER BY entity""".stripMargin,

    "privacy_k_anonymity" ->
      s"""SELECT c_mktsegment, c_nationkey, count(*) AS n_customers,
         |       round(CAST(count(*) AS DOUBLE) /
         |             sum(count(*)) OVER (PARTITION BY c_mktsegment), 6) AS share_of_segment,
         |       CASE WHEN count(*) = 1 THEN 'unique'
         |            WHEN count(*) < $KAnonymity THEN 'below_k'
         |            ELSE 'ok' END AS risk
         |FROM customer
         |GROUP BY c_mktsegment, c_nationkey
         |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "privacy_k_suppression" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment, c_nationkey, count(*) AS n
         |  FROM customer GROUP BY c_mktsegment, c_nationkey
         |), small AS (
         |  SELECT c_mktsegment, CAST(sum(n) AS BIGINT) AS n
         |  FROM cells WHERE n < $KAnonymity GROUP BY c_mktsegment
         |)
         |SELECT * FROM (
         |  SELECT c_mktsegment, c_nationkey::VARCHAR AS nation,
         |         n AS n_customers, 'ok' AS status
         |  FROM cells WHERE n >= $KAnonymity
         |  UNION ALL
         |  SELECT c_mktsegment, '*', n, 'generalized'
         |  FROM small WHERE n >= $KAnonymity
         |  UNION ALL
         |  SELECT c_mktsegment, '<suppressed>', n, 'suppressed'
         |  FROM small WHERE n < $KAnonymity
         |)
         |ORDER BY c_mktsegment, nation""".stripMargin,

    "privacy_l_diversity" ->
      s"""WITH b AS (
         |  SELECT c_mktsegment, c_nationkey,
         |         CASE WHEN c_acctbal < 0 THEN 'debt'
         |              WHEN c_acctbal < 4500 THEN 'low' ELSE 'high' END AS band
         |  FROM customer
         |), cells AS (
         |  SELECT c_mktsegment, c_nationkey, band, count(*) AS n
         |  FROM b GROUP BY 1, 2, 3
         |)
         |SELECT c_mktsegment, c_nationkey,
         |       CAST(sum(n) AS BIGINT) AS n_rows,
         |       count(*) AS l_distinct,
         |       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS dominant_share,
         |       CASE WHEN count(*) = 1 THEN 'homogeneous'
         |            WHEN count(*) < $LDiversity THEN 'below_l'
         |            ELSE 'ok' END AS risk
         |FROM cells GROUP BY 1, 2
         |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "privacy_t_closeness" ->
      s"""WITH b AS (
         |  SELECT c_mktsegment, c_nationkey,
         |         CASE WHEN c_acctbal < 0 THEN 'debt'
         |              WHEN c_acctbal < 4500 THEN 'low' ELSE 'high' END AS band
         |  FROM customer
         |), cells AS (
         |  SELECT c_mktsegment, c_nationkey, band, count(*) AS n
         |  FROM b GROUP BY 1, 2, 3
         |), cls AS (
         |  SELECT c_mktsegment, c_nationkey, CAST(sum(n) AS BIGINT) AS n_rows
         |  FROM cells GROUP BY 1, 2
         |), gd AS (
         |  SELECT band,
         |         CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM b) AS p_global
         |  FROM b GROUP BY band
         |), terms AS (
         |  SELECT cls.c_mktsegment, cls.c_nationkey, cls.n_rows,
         |         round(abs(CAST(coalesce(cells.n, 0) AS DOUBLE) / cls.n_rows
         |               - gd.p_global), 6) AS term
         |  FROM cls CROSS JOIN gd
         |  LEFT JOIN cells ON cells.c_mktsegment = cls.c_mktsegment
         |                 AND cells.c_nationkey = cls.c_nationkey
         |                 AND cells.band = gd.band
         |), agg AS (
         |  SELECT c_mktsegment, c_nationkey,
         |         CAST(max(n_rows) AS BIGINT) AS n_rows,
         |         round(CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE) / 2, 6) AS tvd
         |  FROM terms GROUP BY 1, 2
         |)
         |SELECT c_mktsegment, c_nationkey, n_rows, tvd,
         |       CASE WHEN tvd > $TCloseness THEN 'far' ELSE 'ok' END AS flag
         |FROM agg ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "url_domains" ->
      s"""WITH u AS (
         |  SELECT event_id, user_id, value,
         |         'https://shard' || (user_id % 20) || '.s' || (user_id % 5) ||
         |         '.example.com/p/' || event_id || '?u=' || user_id AS url
         |  FROM events
         |), h AS (
         |  SELECT *, regexp_extract(url, '$HostRe', 1) AS host FROM u
         |)
         |SELECT host, regexp_extract(host, '$RegDomainRe', 1) AS reg_domain,
         |       count(*) AS n_events,
         |       count(DISTINCT user_id) AS n_users,
         |       round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS avg_value
         |FROM h
         |GROUP BY host, regexp_extract(host, '$RegDomainRe', 1)
         |ORDER BY host""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_scrub"   -> (piiScrub _),
    "url_domains" -> (urlDomains _),
    "url_canonical_dedup" -> (urlCanonicalDedup _),
    "privacy_erasure" -> (privacyErasure _),
    "privacy_k_anonymity" -> (privacyKAnonymity _),
    "privacy_k_suppression" -> (privacyKSuppression _),
    "privacy_l_diversity" -> (privacyLDiversity _),
    "privacy_t_closeness" -> (privacyTCloseness _),
  )
}
