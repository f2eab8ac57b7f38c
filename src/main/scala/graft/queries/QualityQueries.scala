package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.quality.Rules
import graft.quality.Rules.{Critical, Error, Rule, Warning}

/** Validation-rule-engine queries (SURVEY §2.3). The rule set below is
  * the reference's vocabulary (required / enum / numeric_range /
  * format) instantiated for the `events` table; thresholds chosen so
  * both passing and failing populations are non-empty. One scan, one
  * 1-row reduce — the shape that stays O(1) output at any input size.
  */
object QualityQueries {

  /** The demo rule set over `events`. */
  def eventRules: Seq[Rule] = Seq(
    Rule("user_required", Critical, Rules.required(col("user_id"))),
    Rule("ts_required", Critical, Rules.required(col("ts"))),
    Rule("type_enum", Error,
      Rules.enumIn(col("event_type"), Seq("view", "click", "purchase"))),
    Rule("value_range", Error, Rules.numericRange(col("value"), 0.0, 100.0)),
    Rule("props_format", Warning,
      Rules.format(col("props"), "^\\{.*\\}$", 2, 64)))

  /** q35 — batch validation stats: per-rule failure counts + validity
    * rate in a single pass (V1, V3, V4, V2, V12–V14). */
  val q35 = QueryDef(
    "q35_validation_stats",
    """SELECT COUNT(*) AS total,
      |  CAST(SUM(CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
      |    AND (event_type IS NULL OR event_type IN ('view','click','purchase'))
      |    AND (value IS NULL OR (value >= 0 AND value <= 100))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS valid,
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_user_required,
      |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS fail_ts_required,
      |  CAST(SUM(CASE WHEN event_type IS NOT NULL
      |    AND event_type NOT IN ('view','click','purchase')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_type_enum,
      |  CAST(SUM(CASE WHEN value IS NOT NULL
      |    AND (value < 0 OR value > 100)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_value_range,
      |  CAST(SUM(CASE WHEN props IS NOT NULL AND NOT (
      |    length(props) BETWEEN 2 AND 64 AND regexp_matches(props, '^\{.*\}$'))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_props_format,
      |  CAST(FLOOR(SUM(CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
      |    AND (event_type IS NULL OR event_type IN ('view','click','purchase'))
      |    AND (value IS NULL OR (value >= 0 AND value <= 100))
      |    THEN 1 ELSE 0 END) * 100.0 / COUNT(*) * 100 + 0.5) AS BIGINT)
      |    / 100.0 AS validity_rate
      |FROM events""".stripMargin) { (s, d) =>
    Rules.batchStats(Tables.events(s, d), eventRules)
  }

  /** q39 — V14 headline quality summary over the same event rule set:
    * failed-check counts by severity, the reference's quality score
    * `max(0, 100 − (10·critical + 5·error))`, and the recommendation
    * string (`data_quality.py:541-573`). */
  val q39 = QueryDef(
    "q39_quality_summary",
    """WITH f AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_user,
      |    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_ts,
      |    CAST(SUM(CASE WHEN event_type IS NOT NULL
      |      AND event_type NOT IN ('view','click','purchase')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS f_type,
      |    CAST(SUM(CASE WHEN value IS NOT NULL
      |      AND (value < 0 OR value > 100)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS f_value,
      |    CAST(SUM(CASE WHEN props IS NOT NULL AND NOT (
      |      length(props) BETWEEN 2 AND 64
      |      AND regexp_matches(props, '^\{.*\}$'))
      |      THEN 1 ELSE 0 END) AS BIGINT) AS f_props
      |  FROM events),
      |s AS (
      |  SELECT f_user + f_ts + f_type + f_value + f_props
      |      AS total_validation_issues,
      |    f_user + f_ts AS critical_issues,
      |    f_type + f_value AS error_issues
      |  FROM f)
      |SELECT total_validation_issues, critical_issues, error_issues,
      |  GREATEST(0, 100 - (critical_issues * 10 + error_issues * 5))
      |    AS quality_score,
      |  CASE
      |    WHEN critical_issues > 0
      |      THEN 'CRITICAL: Address critical data quality issues before proceeding'
      |    WHEN error_issues > total_validation_issues * 0.1
      |      THEN 'HIGH: Significant data quality issues detected, review data sources'
      |    WHEN error_issues > 0
      |      THEN 'MEDIUM: Minor data quality issues, monitor and improve data collection'
      |    ELSE 'GOOD: Data quality is acceptable'
      |  END AS recommendation
      |FROM s""".stripMargin) { (s, d) =>
    Rules.qualitySummary(Tables.events(s, d), eventRules)
  }

  /** Rule set giving V10 a real caller: the nation table with a derived
    * alpha-2 code (first two letters of the name) checked against the
    * shipped ISO-3166 set — a mixed pass/fail population by design. */
  def nationRules: Seq[Rule] = Seq(
    Rule("name_required", Critical, Rules.required(col("n_name"))),
    Rule("region_range", Error,
      Rules.numericRange(col("n_regionkey"), 0.0, 3.0)),
    Rule("country_iso2", Warning,
      Rules.countryCode(substring(col("n_name"), 1, 2))))

  /** q40 — V13 top-failing-rules ranking (most failures first, rules
    * with zero failures excluded, `data_quality.py:536-537`). */
  val q40 = QueryDef(
    "q40_top_failing_rules", {
      val iso = Rules.iso2Codes.map(c => s"'$c'").mkString(", ")
      s"""WITH f AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN n_name IS NULL OR n_name = ''
        |      THEN 1 ELSE 0 END) AS BIGINT) AS f_name,
        |    CAST(SUM(CASE WHEN n_regionkey IS NOT NULL
        |      AND (n_regionkey < 0 OR n_regionkey > 3)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS f_region,
        |    CAST(SUM(CASE WHEN n_name IS NOT NULL
        |      AND upper(substr(n_name, 1, 2)) NOT IN ($iso)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS f_cc
        |  FROM nation)
        |SELECT rule_name, n_failed FROM (
        |  SELECT 'name_required' AS rule_name, f_name AS n_failed FROM f
        |  UNION ALL SELECT 'region_range', f_region FROM f
        |  UNION ALL SELECT 'country_iso2', f_cc FROM f)
        |WHERE n_failed > 0
        |ORDER BY n_failed DESC, rule_name
        |LIMIT 10""".stripMargin
    }) { (s, d) =>
    Rules.topFailingRules(Tables.nation(s, d), nationRules)
  }

  /** q93 — the V8/V9 url/email validators under a full oracle. The
    * testdata carries no URL or email columns, so those two rules
    * only had unit evidence; this query derives a deterministic
    * fixture from `documents` (valid/malformed/null emails by
    * doc_id%4, valid/wrong-scheme/null URLs by doc_id%3), runs the
    * REAL [[Rules.evaluate]] with email_valid gating (Error) and
    * url_valid advisory (Warning), and reports per-source pass and
    * validity counts. Null passes (V1's job), malformed fails, and a
    * failed Warning must NOT invalidate the record — the exact
    * severity semantics the rules engine promises. Regexes are RE2-
    * compatible so DuckDB sees identical matches. */
  val q93 = QueryDef(
    "q93_url_email_rules",
    """WITH f AS (
      |  SELECT source,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |      WHEN 1 THEN 'user' || CAST(doc_id AS VARCHAR) || '@bad'
      |      WHEN 2 THEN NULL ELSE 'not-an-email' END AS email,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 'https://example.com/d' || CAST(doc_id AS VARCHAR)
      |      WHEN 1 THEN 'ftp://files.example.com/x' ELSE NULL END AS url
      |  FROM documents),
      |e AS (
      |  SELECT source,
      |    (email IS NULL OR regexp_matches(email,
      |      '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$'))
      |      AS p_email,
      |    (url IS NULL OR regexp_matches(url,
      |      '^https?://[\w.-]+(:\d+)?(/\S*)?$')) AS p_url
      |  FROM f)
      |SELECT source, COUNT(*) AS docs,
      |  CAST(SUM(CASE WHEN p_email THEN 1 ELSE 0 END) AS BIGINT)
      |    AS email_pass,
      |  CAST(SUM(CASE WHEN p_url THEN 1 ELSE 0 END) AS BIGINT)
      |    AS url_pass,
      |  CAST(SUM(CASE WHEN p_email THEN 1 ELSE 0 END) AS BIGINT)
      |    AS valid_records
      |FROM e GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val fixture = Tables.documents(s, d).select(col("source"),
      when(col("doc_id") % 4 === 0,
        concat(lit("user"), col("doc_id").cast("string"),
          lit("@example.com")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("user"), col("doc_id").cast("string"), lit("@bad")))
        .when(col("doc_id") % 4 === 2, lit(null).cast("string"))
        .otherwise("not-an-email").as("email"),
      when(col("doc_id") % 3 === 0,
        concat(lit("https://example.com/d"), col("doc_id").cast("string")))
        .when(col("doc_id") % 3 === 1, lit("ftp://files.example.com/x"))
        .otherwise(lit(null).cast("string")).as("url"))
    val rules = Seq(
      Rule("email_valid", Error, Rules.emailValid(col("email"))),
      Rule("url_valid", Warning, Rules.urlValid(col("url"))))
    Rules.evaluate(fixture, rules)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("_pass_email_valid"), 1L).otherwise(0L))
          .as("email_pass"),
        sum(when(col("_pass_url_valid"), 1L).otherwise(0L))
          .as("url_pass"),
        sum(when(col("_valid"), 1L).otherwise(0L)).as("valid_records"))
      .orderBy("source")
  }

  /** q95 — V5 (timestamp-parseable) and V7 (conditional-required)
    * under a full oracle, on a deterministic fixture: ts strings
    * cycle valid/garbage/null by doc_id%3, and a contact field that
    * is only required when status='active' cycles filled/empty/null.
    * Both rules gate (Error), so `_valid` = both pass — pinning V7's
    * exact implication semantics (cond not in values ⇒ pass;
    * required() rejects empty string, not just null) and V5's
    * null-passes contract. */
  val q95 = QueryDef(
    "q95_ts_conditional_rules",
    """WITH f AS (
      |  SELECT source,
      |    CASE doc_id % 3
      |      WHEN 0 THEN '2024-01-15 10:30:00'
      |      WHEN 1 THEN 'not-a-timestamp' ELSE NULL END AS ts_str,
      |    CASE doc_id % 2 WHEN 0 THEN 'active' ELSE 'dormant' END
      |      AS status,
      |    CASE doc_id % 5 WHEN 0 THEN 'ok' WHEN 1 THEN '' ELSE NULL END
      |      AS contact
      |  FROM documents),
      |e AS (
      |  SELECT source,
      |    (ts_str IS NULL OR TRY_CAST(ts_str AS TIMESTAMP) IS NOT NULL)
      |      AS p_ts,
      |    (NOT COALESCE(status IN ('active'), FALSE)
      |      OR (contact IS NOT NULL AND contact <> '')) AS p_cond
      |  FROM f)
      |SELECT source, COUNT(*) AS docs,
      |  CAST(SUM(CASE WHEN p_ts THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ts_pass,
      |  CAST(SUM(CASE WHEN p_cond THEN 1 ELSE 0 END) AS BIGINT)
      |    AS cond_pass,
      |  CAST(SUM(CASE WHEN p_ts AND p_cond THEN 1 ELSE 0 END) AS BIGINT)
      |    AS valid_records
      |FROM e GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val fixture = Tables.documents(s, d).select(col("source"),
      when(col("doc_id") % 3 === 0, lit("2024-01-15 10:30:00"))
        .when(col("doc_id") % 3 === 1, lit("not-a-timestamp"))
        .otherwise(lit(null).cast("string")).as("ts_str"),
      when(col("doc_id") % 2 === 0, "active").otherwise("dormant")
        .as("status"),
      when(col("doc_id") % 5 === 0, lit("ok"))
        .when(col("doc_id") % 5 === 1, lit(""))
        .otherwise(lit(null).cast("string")).as("contact"))
    val rules = Seq(
      Rule("ts_valid", Error, Rules.timestampValid(col("ts_str"))),
      Rule("contact_if_active", Error, Rules.conditionalRequired(
        col("contact"), col("status"), Seq("active"))))
    Rules.evaluate(fixture, rules)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("_pass_ts_valid"), 1L).otherwise(0L)).as("ts_pass"),
        sum(when(col("_pass_contact_if_active"), 1L).otherwise(0L))
          .as("cond_pass"),
        sum(when(col("_valid"), 1L).otherwise(0L)).as("valid_records"))
      .orderBy("source")
  }

  /** q142 — robust outlier detection per source (median/MAD, the
    * monitoring-grade replacement for q69's IQR fences when tails are
    * heavy): per-source median of `n_chars`, median absolute
    * deviation around it, and the count of documents beyond 3·MAD —
    * all integer-exact. Both medians ride the mergeable quantile
    * sketch ([[graft.functions.Quant]], exact regime at these group
    * sizes — the q123 contract), so the whole statistic is two
    * sketch aggregations + two keyed joins: no per-group sort, and
    * the same plan maintains itself under streaming. The oracle
    * recomputes both medians with the identical integer rank rule
    * (`max(1, ⌈n/2⌉)` over the sorted multiset), making the sketch's
    * exact-regime claim the thing being checked. */
  val q142 = QueryDef(
    "q142_mad_outliers",
    """WITH o AS (
      |  SELECT source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |med AS (
      |  SELECT source,
      |    CAST(MAX(CASE WHEN rn = GREATEST(1, (500000 * n + 999999)
      |      // 1000000) THEN n_chars END) AS BIGINT) AS med
      |  FROM o GROUP BY source),
      |dev AS (
      |  SELECT d.source, ABS(d.n_chars - m.med) AS dv, m.med
      |  FROM documents d JOIN med m ON d.source = m.source),
      |o2 AS (
      |  SELECT source, dv, med,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY dv) AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT source, MAX(med) AS med,
      |    CAST(MAX(CASE WHEN rn = GREATEST(1, (500000 * n + 999999)
      |      // 1000000) THEN dv END) AS BIGINT) AS mad
      |  FROM o2 GROUP BY source)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  MAX(m.med) AS med, MAX(m.mad) AS mad,
      |  CAST(SUM(CASE WHEN ABS(d.n_chars - m.med) > 3 * m.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM documents d JOIN mad m ON d.source = m.source
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
    import graft.functions.Quant
    val docs = Tables.documents(s, d)
    val med = Quant.quantilesBy(docs, Seq(col("source")), col("n_chars"),
        k = 4096, probesPpm = Seq(500000L))
      .select(col("source"), col("q_500000").as("med"))
    val dev = docs.join(med, Seq("source"))
      .select(col("source"), col("n_chars"), col("med"),
        abs(col("n_chars") - col("med")).as("dv"))
    val mad = Quant.quantilesBy(dev, Seq(col("source")), col("dv"),
        k = 4096, probesPpm = Seq(500000L))
      .select(col("source"), col("q_500000").as("mad"))
    dev.join(mad, Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dv") > col("mad") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("source")
  }

  /** q154 — per-source corpus datacard (the "datasheets for
    * datasets" summary a curation run publishes with each drop:
    * volume, mean length, language share, rule-gate pass rate, and
    * exact-dup health, one row per source): every ratio in exact ppm,
    * the gate predicate is q85/q138's Gopher-style rule, uniqueness
    * is the singleton share of the per-source md5(text) census.
    * Shape: one row-local projection feeding two keyed censuses (the
    * hash census collapses to ≤1 row per distinct text per source
    * map-side) joined on source — at 100 TB a free rider on the
    * silver scan, output |sources| rows. */
  val q154 = QueryDef(
    "q154_corpus_datacard",
    """WITH b AS (
      |  SELECT source, md5(text) AS h,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
      |    len(string_split(text, ' ')) AS n_words,
      |    length(replace(text, ' ', '')) AS n_word_chars,
      |    len(list_filter(string_split(text, ' '),
      |      x -> regexp_matches(x, '^[A-Za-z]+$'))) AS n_alpha_words,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a', 'of', 'to', 'and', 'in'))) AS n_stop
      |  FROM documents),
      |g AS (
      |  SELECT source, h, is_en, n_words,
      |    CASE WHEN n_words BETWEEN 50 AND 100000
      |      AND (n_word_chars * 1000) // n_words BETWEEN 3000 AND 10000
      |      AND (n_alpha_words * 1000000) // n_words >= 800000
      |      AND n_stop >= 2 THEN 1 ELSE 0 END AS gate
      |  FROM b),
      |dup AS (
      |  SELECT source,
      |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS uniq_docs FROM (
      |      SELECT source, h, COUNT(*) AS c FROM g GROUP BY 1, 2)
      |  GROUP BY source),
      |a AS (
      |  SELECT source, COUNT(*) AS n_docs, SUM(n_words) AS n_tokens,
      |    SUM(is_en) AS en_docs, SUM(gate) AS gate_docs
      |  FROM g GROUP BY source)
      |SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
      |  CAST(a.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(a.n_tokens // a.n_docs AS BIGINT) AS mean_doc_tokens,
      |  CAST(a.en_docs * 1000000 // a.n_docs AS BIGINT) AS en_ppm,
      |  CAST(a.gate_docs * 1000000 // a.n_docs AS BIGINT)
      |    AS gate_pass_ppm,
      |  CAST(dup.uniq_docs * 1000000 // a.n_docs AS BIGINT) AS uniq_ppm
      |FROM a JOIN dup USING (source) ORDER BY a.source""".stripMargin) {
    (s, d) =>
      val w = split(col("text"), " ")
      val base = Tables.documents(s, d).select(col("source"),
        md5(col("text")).as("h"),
        (col("lang") === "en").cast("long").as("is_en"),
        size(w).cast("long").as("n_words"),
        length(translate(col("text"), " ", "")).cast("long")
          .as("n_word_chars"),
        size(filter(w, x => x.rlike("^[A-Za-z]+$"))).cast("long")
          .as("n_alpha_words"),
        size(filter(w, x => x.isin("the", "a", "of", "to", "and", "in")))
          .cast("long").as("n_stop"))
      val g = base.select(col("source"), col("h"), col("is_en"),
        col("n_words"),
        when(col("n_words").between(50, 100000) &&
          expr("(n_word_chars * 1000) div n_words").between(3000, 10000) &&
          expr("(n_alpha_words * 1000000) div n_words") >= 800000 &&
          col("n_stop") >= 2, 1L).otherwise(0L).as("gate"))
      val dup = g.groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(when(col("c") === 1, 1L).otherwise(0L)).as("uniq_docs"))
      g.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          sum(col("is_en")).as("en_docs"),
          sum(col("gate")).as("gate_docs"))
        .join(dup, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("n_tokens div n_docs").as("mean_doc_tokens"),
          expr("en_docs * 1000000 div n_docs").as("en_ppm"),
          expr("gate_docs * 1000000 div n_docs").as("gate_pass_ppm"),
          expr("uniq_docs * 1000000 div n_docs").as("uniq_ppm"))
        .orderBy("source")
  }

  /** q180 — Benford first-significant-digit forensics (Benford 1938;
    * the fraud/synthetic-data screen an ingest pipeline runs on any
    * monetary column): census of the first significant digit of
    * `l_extendedprice` against the Benford expectation
    * log₁₀(1 + 1/d). Digit extraction is integer-portable: prices
    * snap to exact CENTS (BIGINT), and the first digit of an integer
    * is `c div 10^(len(str(c)) − 1)` — integer-to-string rendering is
    * identical across engines, no float formatting or libm log in
    * the data path (the expectation table is nine literal ppm
    * constants). Deviation in ppm per digit plus the row-wise
    * absolute deviation — the "does this feed look fabricated"
    * number. Scale: one projection + one 9-group census. */
  val q180 = QueryDef(
    "q180_benford_digits", {
      val benford = Seq(301029, 176091, 124938, 96910, 79181,
        66946, 57991, 51152, 45757)
      val benfordCase = benford.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
      s"""WITH c AS (
        |  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice > 0),
        |d AS (
        |  SELECT cents // CAST(POW(10, LENGTH(CAST(cents AS VARCHAR)) - 1)
        |    AS BIGINT) AS digit
        |  FROM c),
        |g AS (
        |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n,
        |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST(CASE digit $benfordCase END AS BIGINT) AS benford_ppm,
        |  CAST(ABS(n * 1000000 // total - CASE digit $benfordCase END)
        |    AS BIGINT) AS dev_ppm
        |FROM g CROSS JOIN t
        |ORDER BY digit""".stripMargin
    }) { (s, d) =>
    val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val benfordCol = benford.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    val g = graft.Tables.lineitem(s, d)
      .filter(col("l_extendedprice") > 0)
      .select(floor(col("l_extendedprice") * 100 + lit(0.5))
        .cast("long").as("cents"))
      .select((col("cents") / pow(lit(10),
        length(col("cents").cast("string")) - 1).cast("long"))
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val t = g.agg(sum(col("n")).as("total"))
    g.crossJoin(broadcast(t))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("benford_ppm", benfordCol)
      .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
      .select("digit", "n", "share_ppm", "benford_ppm", "dev_ppm")
      .orderBy("digit")
  }

  /** q199 — SILVER PROJECTION CENSUS: one oracle query that runs every
    * remaining scalar silver/validation op through the DuckDB gate —
    * P9 (month/year), P12 (mobile flag, null→false), P16 (category
    * initcap), P17 (stock flag, null→false), P18 (account age, pinned
    * `now`), P21 (rating category), P22 (customer segment), P23 (CLV),
    * P25 (processing metadata), V6 (timestamp range) — closing the §2
    * rows previously evidenced by unit tests only. Each section
    * applies the REAL production expression ([[graft.functions
    * .TimeFeatures]]/[[graft.functions.Buckets]], the exact Columns
    * Silver.* uses) to a deterministic stand-in input and censuses the
    * result as (metric, bucket, n) rows; DuckDB mirrors every formula,
    * including a hand-rolled initcap (DuckDB 1.0 lacks one) and the
    * accountAgeDays floor-elapsed-seconds arithmetic against the
    * pinned anchor 2026-01-01 UTC (= epoch 1767225600 — P18's
    * current_timestamp is the one non-deterministic input, pinned here
    * exactly like V6's `now`).
    *
    * Scale: every section is one scan + one map-side-combined census;
    * the per-customer P22/P23 section is one keyed agg. Output is
    * bounded by the bucket vocabularies. */
  val q199 = QueryDef(
    "q199_silver_census",
    """WITH dev AS (
      |  SELECT (['mobile','desktop','tablet',NULL])
      |      [CAST(event_id % 4 + 1 AS INT)] AS device
      |  FROM events),
      |cust AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |seg AS (
      |  SELECT o_custkey, n_orders, cents,
      |    (cents // n_orders) / 100.0 AS aov
      |  FROM cust)
      |SELECT 'p9_month' AS metric,
      |  CAST(year(ts)*100 + month(ts) AS VARCHAR) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY 2
      |UNION ALL
      |SELECT 'p12_mobile',
      |  CAST(COALESCE(lower(device) IN ('mobile','tablet'), false)
      |    AS VARCHAR),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM dev GROUP BY 2
      |UNION ALL
      |SELECT 'p16_initcap',
      |  array_to_string(list_transform(
      |    string_split(trim(lower(p_type || ' ' || p_brand)), ' '),
      |    w -> upper(w[1]) || w[2:]), ' '),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM part GROUP BY 2
      |UNION ALL
      |SELECT 'p17_stock',
      |  CAST(COALESCE(
      |    (CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_size - 25 END) > 0,
      |    false) AS VARCHAR),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM part GROUP BY 2
      |UNION ALL
      |SELECT 'p18_age_years',
      |  CAST(CAST(FLOOR((1767225600 - epoch(o_orderdate)) / 86400)
      |    AS BIGINT) // 365 AS VARCHAR),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders GROUP BY 2
      |UNION ALL
      |SELECT 'p21_rating',
      |  CASE WHEN (o_orderkey % 50)/10.0 >= 4.5 THEN 'excellent'
      |       WHEN (o_orderkey % 50)/10.0 >= 4.0 THEN 'good'
      |       WHEN (o_orderkey % 50)/10.0 >= 3.0 THEN 'average'
      |       ELSE 'poor' END,
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders GROUP BY 2
      |UNION ALL
      |SELECT 'p22_segment',
      |  CASE WHEN n_orders = 0 THEN 'new'
      |       WHEN n_orders < 5 THEN 'occasional'
      |       WHEN aov > 200 THEN 'high_value'
      |       ELSE 'regular' END,
      |  CAST(COUNT(*) AS BIGINT)
      |FROM seg GROUP BY 2
      |UNION ALL
      |SELECT 'p23_clv_50k',
      |  CAST(((cents // n_orders) * n_orders) // 5000000 AS VARCHAR),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM seg GROUP BY 2
      |UNION ALL
      |SELECT 'p25_meta', 'graft_silver_v1', CAST(COUNT(*) AS BIGINT)
      |FROM customer
      |UNION ALL
      |SELECT 'v6_ts_range',
      |  CAST(ts >= TIMESTAMP '2024-01-01'
      |    AND ts < TIMESTAMP '2024-07-01' AS VARCHAR),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM events GROUP BY 2
      |ORDER BY metric, bucket""".stripMargin) { (s, d) =>
    import graft.functions.{Buckets, TimeFeatures}
    val ev = Tables.events(s, d)
    val part = Tables.part(s, d)
    val orders = Tables.orders(s, d)
    def census(metric: String, df: org.apache.spark.sql.DataFrame,
               bucket: org.apache.spark.sql.Column) =
      df.groupBy(bucket.cast("string").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(lit(metric).as("metric"), col("bucket"), col("n"))
    val p9 = census("p9_month", ev,
      TimeFeatures.yearOf(col("ts")) * 100 + TimeFeatures.monthOf(col("ts")))
    val device = element_at(
      array(lit("mobile"), lit("desktop"), lit("tablet"),
        lit(null).cast("string")),
      (col("event_id") % 4 + 1).cast("int"))
    // P12: the exact Silver.clickstream expression (null device → false)
    val p12 = census("p12_mobile", ev,
      coalesce(lower(device).isin("mobile", "tablet"), lit(false)))
    val p16 = census("p16_initcap", part,
      initcap(trim(concat_ws(" ", col("p_type"), col("p_brand")))))
    // P17: the exact Silver.products expression (null stock → false)
    val stock = when(col("p_partkey") % 7 === 0, lit(null).cast("int"))
      .otherwise(col("p_size") - 25)
    val p17 = census("p17_stock", part,
      coalesce(stock > 0, lit(false)))
    // P18: accountAgeDays' floor-elapsed-seconds form with `now`
    // pinned to 2026-01-01T00:00Z (epoch 1767225600)
    val p18 = census("p18_age_years", orders,
      expr("cast(floor((1767225600 - unix_timestamp(o_orderdate)) / 86400)" +
        " as bigint) div 365"))
    val p21 = census("p21_rating", orders,
      Buckets.ratingCategory((col("o_orderkey") % 50) / 10.0))
    val cust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      .withColumn("aov", expr("cents div n_orders") / 100.0)
    val p22 = census("p22_segment", cust,
      Buckets.customerSegment(col("n_orders"), col("aov")))
    val p23 = census("p23_clv_50k", cust,
      expr("((cents div n_orders) * n_orders) div 5000000"))
    val p25 = Tables.customer(s, d)
      .agg(count(lit(1)).as("n"))
      .select(lit("p25_meta").as("metric"),
        lit("graft_silver_v1").as("bucket"), col("n"))
    val v6 = census("v6_ts_range", ev,
      col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-07-01").cast("timestamp"))
    Seq(p9, p12, p16, p17, p18, p21, p22, p23, p25, v6)
      .reduce(_ unionByName _)
      .orderBy("metric", "bucket")
  }

  // ---------------------------------------------------------------------
  // q338 — SPRT quality-gate monitor (Wald sequential test)
  // ---------------------------------------------------------------------

  /** q338 — SPRT gate monitor (Wald 1945's sequential probability
    * ratio test): replay the purchase-rate stream day by day and ask
    * WHEN a sequential monitor would have stopped — the
    * fixed-horizon companions (q214's A/B z-test, q215's CUSUM
    * changepoint) decide after seeing everything; SPRT decides as
    * early as the evidence allows with guaranteed error rates.
    * Spec constants: H₀ p₀ = 200000 ppm (healthy purchase share),
    * H₁ p₁ = 150000 ppm (degraded), α = β = 0.05 → Wald bounds
    * ±⌊1000·ln 19⌋ = ±2944 mnat. Per day the exact-integer LLR
    * increment n_pass·Δ₁ + (n−n_pass)·Δ₂ with
    * Δ₁ = mnat(p₁)−mnat(p₀), Δ₂ = mnat(10⁶−p₁)−mnat(10⁶−p₀) — lns
    * of INTEGER constants floored to the milli-nat grid (the q130
    * portability contract), all downstream arithmetic exact. Output
    * per day: counts, daily and cumulative LLR, the instantaneous
    * state (2 = reject H₀ / 1 = continue / 0 = accept H₀ — per-row,
    * not sticky, stated), plus the monitor's verdict as constant
    * columns (first crossing day and its sign).
    *
    * Scale: one daily keyed census (calendar-bounded), a prefix
    * window + a one-row first-crossing fold over it — the corpus
    * touches only the first agg. */
  val q338 = QueryDef(
    "q338_sprt_monitor", {
      def mn(k: Long) = s"CAST(FLOOR(LN(CAST($k AS DOUBLE)) * 1000) AS BIGINT)"
      val d1 = s"(${mn(150000L)} - ${mn(200000L)})"
      val d2 = s"(${mn(850000L)} - ${mn(800000L)})"
      s"""WITH dx AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS np
      |  FROM events GROUP BY 1),
      |cs AS (
      |  SELECT day, n, np,
      |    CAST(np * $d1 + (n - np) * $d2 AS BIGINT) AS llr_day,
      |    CAST(SUM(np * $d1 + (n - np) * $d2) OVER (ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS llr_cum
      |  FROM dx),
      |stop AS (
      |  SELECT COALESCE(MIN(day), DATE '9999-12-31') AS stop_day,
      |    CAST(COALESCE(MAX(CASE WHEN rk = 1 THEN st END), 1)
      |      AS BIGINT) AS stop_state
      |  FROM (
      |    SELECT day, CASE WHEN llr_cum >= 2944 THEN 2 ELSE 0 END
      |        AS st,
      |      ROW_NUMBER() OVER (ORDER BY day) AS rk
      |    FROM cs WHERE llr_cum >= 2944 OR llr_cum <= -2944))
      |SELECT cs.day, cs.n AS n_events, cs.np AS n_pass,
      |  cs.llr_day AS llr_day_mnat, cs.llr_cum AS llr_cum_mnat,
      |  CAST(CASE WHEN cs.llr_cum >= 2944 THEN 2
      |    WHEN cs.llr_cum <= -2944 THEN 0 ELSE 1 END AS BIGINT)
      |    AS state,
      |  stop.stop_day, stop.stop_state
      |FROM cs CROSS JOIN stop ORDER BY cs.day""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Checkpoints
    def mn(k: Long) =
      floor(log(lit(k).cast("double")) * 1000).cast("long")
    val d1 = mn(150000L) - mn(200000L)
    val d2 = mn(850000L) - mn(800000L)
    // prefix/rank windows ride the calendar-bounded daily census —
    // PlanSpec window-allowlisted
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = Checkpoints.pin(
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .withColumn("llr_day",
          col("np") * d1 + (col("n") - col("np")) * d2)
        .withColumn("llr_cum", sum(col("llr_day")).over(wd))
        .localCheckpoint())
    val crossed = cs
      .filter(col("llr_cum") >= 2944L || col("llr_cum") <= -2944L)
      .withColumn("rk",
        org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy(col("day"))))
      .agg(
        coalesce(min(col("day")), lit(java.sql.Date.valueOf("9999-12-31")))
          .as("stop_day"),
        coalesce(max(when(col("rk") === 1,
            when(col("llr_cum") >= 2944L, 2L).otherwise(0L))),
          lit(1L)).as("stop_state"))
    cs.crossJoin(broadcast(crossed))
      .select(col("day"), col("n").as("n_events"), col("np").as("n_pass"),
        col("llr_day").as("llr_day_mnat"),
        col("llr_cum").as("llr_cum_mnat"),
        when(col("llr_cum") >= 2944L, 2L)
          .when(col("llr_cum") <= -2944L, 0L).otherwise(1L).as("state"),
        col("stop_day"), col("stop_state"))
      .orderBy("day")
  }

  val all: Seq[QueryDef] =
    Seq(q35, q39, q40, q93, q95, q142, q154, q180, q199, q338)
}
