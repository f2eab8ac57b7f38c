package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rule engine (SURVEY §2.3 V1–V16).
  *
  * The reference declares rules as config and dispatches per-record in
  * Python (`processing/utils/data_quality.py:57-345`; note its
  * conditional_required is buggy at :435 — we implement the intended
  * semantics per SURVEY V7). Here a rule is a named, severity-tagged
  * pass-`Column`: the whole rule set evaluates in ONE projection pass
  * (no per-rule scans), and batch statistics are ONE aggregation —
  * at 100 TB that is a single map + a single 1-row reduce.
  */
object Rules {

  sealed trait Severity { def weight: Int }
  case object Critical extends Severity { val weight = 10 }
  case object Error    extends Severity { val weight = 5 }
  case object Warning  extends Severity { val weight = 0 }

  /** A named validation rule: `passes` is true for conforming rows.
    * Null handling follows the reference: `required` fails on null,
    * every other rule passes nulls (validate-if-present). */
  final case class Rule(name: String, severity: Severity, passes: Column)

  // --- Predicate vocabulary (V1–V11) ---------------------------------

  /** V1: non-null and non-empty-string. */
  def required(c: Column): Column = c.isNotNull && c.cast("string") =!= ""

  /** V2: regex + length bounds; null passes. */
  def format(c: Column, pattern: String, minLen: Int, maxLen: Int): Column =
    c.isNull || (length(c).between(minLen, maxLen) && c.rlike(pattern))

  /** V3: enum membership; null passes (nullability is V1's job). */
  def enumIn(c: Column, allowed: Seq[String]): Column =
    c.isNull || c.isin(allowed: _*)

  /** V4: numeric range; non-castable or out-of-range fails, null
    * passes. `try_cast`, not `cast`: a plain cast THROWS under ANSI
    * mode (the Spark 4 default) on a non-numeric string — a validator
    * must classify bad input, never crash on it (the V5 lesson). */
  def numericRange(c: Column, min: Double, max: Double): Column =
    c.isNull || c.try_cast(org.apache.spark.sql.types.DoubleType)
      .between(min, max)

  /** V5: parseable timestamp; null passes. `try_to_timestamp`, not
    * `to_timestamp`: under ANSI mode (the Spark 4 default) the latter
    * THROWS on a malformed string — a validator must classify bad
    * input, never crash on it (latent until the q95 fixture fed it
    * actual garbage). */
  def timestampValid(c: Column): Column =
    c.isNull || try_to_timestamp(c.cast("string")).isNotNull

  /** V6: recency window [now − maxDaysOld, now + maxDaysFuture] —
    * INTERVAL arithmetic on the timestamp, not date_sub/date_add:
    * those return DateType (midnight-truncated), which turned
    * "no future events" (`maxDaysFuture = 0`) into "nothing after
    * TODAY 00:00", rejecting every valid event earlier today. */
  def timestampRange(c: Column, maxDaysOld: Int, maxDaysFuture: Int): Column =
    c.isNull || c.between(
      current_timestamp() - expr(s"INTERVAL $maxDaysOld DAYS"),
      current_timestamp() + expr(s"INTERVAL $maxDaysFuture DAYS"))

  /** V7 (intended semantics): `c` required iff `cond` ∈ values. */
  def conditionalRequired(c: Column, cond: Column,
                          values: Seq[String]): Column =
    !coalesce(cond.isin(values: _*), lit(false)) || required(c)

  /** V8: http(s) URL. */
  def urlValid(c: Column): Column =
    c.isNull || c.rlike("^https?://[\\w.-]+(:\\d+)?(/\\S*)?$")

  /** V9: email. */
  def emailValid(c: Column): Column =
    c.isNull || c.rlike("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")

  /** The ISO-3166-1 alpha-2 code set (public standard, 249 codes; the
    * reference embeds the same set, `data_quality.py:469-491`). */
  val iso2Codes: Seq[String] = Seq(
    "AD", "AE", "AF", "AG", "AI", "AL", "AM", "AO", "AQ", "AR", "AS", "AT",
    "AU", "AW", "AX", "AZ", "BA", "BB", "BD", "BE", "BF", "BG", "BH", "BI",
    "BJ", "BL", "BM", "BN", "BO", "BQ", "BR", "BS", "BT", "BV", "BW", "BY",
    "BZ", "CA", "CC", "CD", "CF", "CG", "CH", "CI", "CK", "CL", "CM", "CN",
    "CO", "CR", "CU", "CV", "CW", "CX", "CY", "CZ", "DE", "DJ", "DK", "DM",
    "DO", "DZ", "EC", "EE", "EG", "EH", "ER", "ES", "ET", "FI", "FJ", "FK",
    "FM", "FO", "FR", "GA", "GB", "GD", "GE", "GF", "GG", "GH", "GI", "GL",
    "GM", "GN", "GP", "GQ", "GR", "GS", "GT", "GU", "GW", "GY", "HK", "HM",
    "HN", "HR", "HT", "HU", "ID", "IE", "IL", "IM", "IN", "IO", "IQ", "IR",
    "IS", "IT", "JE", "JM", "JO", "JP", "KE", "KG", "KH", "KI", "KM", "KN",
    "KP", "KR", "KW", "KY", "KZ", "LA", "LB", "LC", "LI", "LK", "LR", "LS",
    "LT", "LU", "LV", "LY", "MA", "MC", "MD", "ME", "MF", "MG", "MH", "MK",
    "ML", "MM", "MN", "MO", "MP", "MQ", "MR", "MS", "MT", "MU", "MV", "MW",
    "MX", "MY", "MZ", "NA", "NC", "NE", "NF", "NG", "NI", "NL", "NO", "NP",
    "NR", "NU", "NZ", "OM", "PA", "PE", "PF", "PG", "PH", "PK", "PL", "PM",
    "PN", "PR", "PS", "PT", "PW", "PY", "QA", "RE", "RO", "RS", "RU", "RW",
    "SA", "SB", "SC", "SD", "SE", "SG", "SH", "SI", "SJ", "SK", "SL", "SM",
    "SN", "SO", "SR", "SS", "ST", "SV", "SX", "SY", "SZ", "TC", "TD", "TF",
    "TG", "TH", "TJ", "TK", "TL", "TM", "TN", "TO", "TR", "TT", "TV", "TW",
    "TZ", "UA", "UG", "UM", "US", "UY", "UZ", "VA", "VC", "VE", "VG", "VI",
    "VN", "VU", "WF", "WS", "YE", "YT", "ZA", "ZM", "ZW")

  /** V10: ISO-3166 alpha-2 membership; defaults to [[iso2Codes]]. */
  def countryCode(c: Column, iso2: Seq[String] = iso2Codes): Column =
    c.isNull || upper(c).isin(iso2: _*)

  /** V11: string length bounds; null passes. */
  def stringLength(c: Column, min: Int, max: Int): Column =
    c.isNull || length(c).between(min, max)

  // --- Evaluation (V12–V14) ------------------------------------------

  /** Backtick-quoted column reference: rule names are user data
    * (spaces, dots, quotes all legal), and a bare `col(s"_pass_$name")`
    * would parse a dotted name as a struct access. withColumn/alias
    * write names literally; every read must come through here. */
  private def passCol(r: Rule): Column =
    col("`_pass_" + r.name.replace("`", "``") + "`")

  /** One projection adding a boolean pass-flag per rule plus `_valid`
    * (V12: no failed Critical/Error rule). */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val flagged = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"_pass_${r.name}", coalesce(r.passes, lit(false)))
    }
    val gating = rules.filter(r => r.severity != Warning)
    val valid = gating.map(passCol)
      .reduceOption(_ && _).getOrElse(lit(true))
    flagged.withColumn("_valid", valid)
  }

  /** V13 (flat form): one-row batch statistics — total/valid counts,
    * per-rule failure counts, validity rate. The severity-weighted
    * quality score and recommendation live in [[qualitySummary]] (V14);
    * the top-10 failure ranking in [[topFailingRules]]. */
  def batchStats(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val ev = evaluate(df, rules)
    val perRule = rules.map(r =>
      sum(when(!passCol(r), 1).otherwise(0))
        .cast("long").as(s"fail_${r.name}"))
    val aggs = Seq(
      count(lit(1)).as("total"),
      sum(when(col("_valid"), 1).otherwise(0)).cast("long").as("valid")
    ) ++ perRule
    ev.agg(aggs.head, aggs.tail: _*)
      .withColumn("validity_rate",
        // portable HALF_UP: valid/total quotients land on exact halves
        // and round(x, 2) diverges across engines (Exact.round2 doc)
        graft.functions.Exact.round2(
          col("valid") * lit(100.0) / col("total")))
  }

  /** V13: the top-N failing rules, most failures first (the
    * reference's `top_failures`, `data_quality.py:536-537`). Rules with
    * zero failures never appear (matching the reference, whose failure
    * dict only ever gains keys on a failure); ties break on rule name
    * for determinism. One aggregation + an unpivot of the 1-row frame —
    * no extra scan per rule. */
  def topFailingRules(df: DataFrame, rules: Seq[Rule],
                      n: Int = 10): DataFrame = {
    val ev = evaluate(df, rules)
    // (name, count) pairs built with the Column API — interpolating
    // rule names into a selectExpr stack() would parse-fail on a name
    // with a space/hyphen and lets a quote inject arbitrary SQL
    val pairs = rules.map(r => struct(
      lit(r.name).as("rule_name"),
      sum(when(!passCol(r), 1L).otherwise(0L)).as("n_failed")))
    ev.agg(array(pairs: _*).as("a"))
      .select(explode(col("a")).as("p"))
      .select(col("p.rule_name"), col("p.n_failed"))
      .filter(col("n_failed") > 0)
      .orderBy(col("n_failed").desc, col("rule_name"))
      .limit(n)
  }

  /** V14: the reference's headline quality summary
    * (`data_quality.py:541-573`): failed-check counts by severity, the
    * quality score `max(0, 100 − (10·critical + 5·error))`, and the
    * recommendation string. Counts are failed rule INSTANCES
    * (record × rule), exactly as the reference accumulates them. One
    * scan, one 1-row reduce. */
  def qualitySummary(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val ev = evaluate(df, rules)
    def issues(sel: Severity => Boolean): Column =
      rules.filter(r => sel(r.severity))
        .map(r => sum(when(!passCol(r), 1L).otherwise(0L)))
        .reduceOption(_ + _).getOrElse(lit(0L)).cast("long")
    ev.agg(
      issues(_ => true).as("total_validation_issues"),
      issues(_ == Critical).as("critical_issues"),
      issues(_ == Error).as("error_issues"))
      .withColumn("quality_score",
        greatest(lit(0L), lit(100L) -
          (col("critical_issues") * Critical.weight +
            col("error_issues") * Error.weight)))
      .withColumn("recommendation",
        when(col("critical_issues") > 0,
          "CRITICAL: Address critical data quality issues before proceeding")
          .when(col("error_issues") >
            col("total_validation_issues") * 0.1,
            "HIGH: Significant data quality issues detected, review data sources")
          .when(col("error_issues") > 0,
            "MEDIUM: Minor data quality issues, monitor and improve data collection")
          .otherwise("GOOD: Data quality is acceptable"))
  }

  /** V15: the quality gate — true when the batch passes the threshold
    * (reference default 0.8, `processing/utils/config.py:20`). An
    * EMPTY batch passes vacuously: zero rows carry no evidence of bad
    * data, and promoting zero rows is harmless — without the guard the
    * NULL sum over zero rows would NPE the caller (e.g. a first gold
    * run before any silver data lands). */
  def gate(stats: DataFrame, threshold: Double = 0.8): Boolean = {
    val row = stats.select(
      coalesce(col("valid"), lit(0L)).cast("double"),
      col("total").cast("double")).head()
    val (v, t) = (row.getDouble(0), row.getDouble(1))
    t == 0.0 || v / t >= threshold
  }

  /** V16: validity-rate trend over the last N pipeline runs
    * (`data_quality.py:592-608`): mean/stddev/min/max of
    * valid/records, plus a degrading flag when the latest run falls
    * more than one stddev below the mean. Expects the run-metadata table
    * written by [[graft.sources.Medallion.writeRunMetadata]]. */
  def trend(runMeta: DataFrame, lastN: Int = 10): DataFrame = {
    val recent = runMeta
      .withColumn("rate", col("valid_records") / col("records"))
      .orderBy(col("run_at").desc)
      .limit(lastN)
    recent.agg(
      count(lit(1)).as("n_runs"),
      round(avg(col("rate")), 4).as("mean_rate"),
      round(coalesce(stddev_samp(col("rate")), lit(0.0)), 4)
        .as("stddev_rate"),
      round(min(col("rate")), 4).as("min_rate"),
      round(max(col("rate")), 4).as("max_rate"),
      round(max_by(col("rate"), col("run_at")), 4).as("latest_rate"))
      .withColumn("degrading",
        col("latest_rate") < col("mean_rate") - col("stddev_rate"))
  }
}
