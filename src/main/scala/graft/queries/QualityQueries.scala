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
      |  ROUND(SUM(CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
      |    AND (event_type IS NULL OR event_type IN ('view','click','purchase'))
      |    AND (value IS NULL OR (value >= 0 AND value <= 100))
      |    THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS validity_rate
      |FROM events""".stripMargin) { (s, d) =>
    Rules.batchStats(Tables.events(s, d), eventRules)
  }

  val all: Seq[QueryDef] = Seq(q35)
}
