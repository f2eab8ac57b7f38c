package graft

import org.apache.spark.sql.functions._

import graft.quality.Rules
import graft.quality.Rules.{Critical, Error, Rule, Warning}

class RulesSpec extends SparkSpec {
  import spark.implicits._

  test("predicates: required / enum / range / length null semantics") {
    val df = Seq(
      (Some("u1"), Some("view"), Some(5.0), Some("ok@x.io")),
      (None, Some("bogus"), Some(-1.0), Some("not-an-email")),
      (Some(""), None, None, None))
      .toDF("u", "et", "v", "em")
      .select(
        Rules.required(col("u")).as("req"),
        Rules.enumIn(col("et"), Seq("view", "click")).as("en"),
        Rules.numericRange(col("v"), 0, 10).as("rng"),
        Rules.emailValid(col("em")).as("em"))
    val rows = df.collect()
    assert(rows(0).toSeq == Seq(true, true, true, true))
    assert(rows(1).toSeq == Seq(false, false, false, false))
    // null passes every validate-if-present rule; "" fails required
    assert(rows(2).toSeq == Seq(false, true, true, true))
  }

  test("conditionalRequired fires only when condition matches") {
    val df = Seq(
      ("purchase", Some("pm1")), ("purchase", None), ("view", None))
      .toDF("et", "pay")
      .select(Rules.conditionalRequired(col("pay"), col("et"),
        Seq("purchase")).as("ok"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, false, true))
  }

  test("evaluate + batchStats: warnings don't gate validity") {
    val df = Seq(
      (Some("u1"), 5.0), (None, 5.0), (Some("u3"), 99.0))
      .toDF("u", "v")
    val rules = Seq(
      Rule("u_req", Critical, Rules.required(col("u"))),
      Rule("v_rng", Error, Rules.numericRange(col("v"), 0, 10)),
      Rule("v_warn", Warning, col("v") < 50))
    val ev = Rules.evaluate(df, rules)
    assert(ev.filter(col("_valid")).count() == 1)
    val st = Rules.batchStats(df, rules).head()
    assert(st.getAs[Long]("total") == 3)
    assert(st.getAs[Long]("valid") == 1)
    assert(st.getAs[Long]("fail_u_req") == 1)
    assert(st.getAs[Long]("fail_v_rng") == 1)
    assert(st.getAs[Long]("fail_v_warn") == 1)
    assert(!Rules.gate(Rules.batchStats(df, rules), 0.8))
    assert(Rules.gate(Rules.batchStats(df, rules), 0.3))
    // empty batch: vacuous pass, not an NPE (sum over 0 rows is NULL)
    assert(Rules.gate(Rules.batchStats(df.limit(0), rules), 0.8))
  }

  test("rule names that are not bare identifiers survive every API") {
    val df = Seq((Some("u1"), 5.0), (None, 99.0)).toDF("u", "v")
    val rules = Seq(
      Rule("user id required", Critical, Rules.required(col("u"))),
      Rule("value.range 0-10", Error, Rules.numericRange(col("v"), 0, 10)),
      Rule("don't exceed 50", Warning, col("v") < 50))
    assert(Rules.evaluate(df, rules).filter(col("_valid")).count() == 1)
    val top = Rules.topFailingRules(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == Map("user id required" -> 1L, "value.range 0-10" -> 1L,
      "don't exceed 50" -> 1L))
    val qs = Rules.qualitySummary(df, rules).head()
    assert(qs.getAs[Long]("critical_issues") == 1)
  }

  test("trend (V16): rolling validity-rate stats + degradation flag") {
    val meta = Seq(
      ("p", 100L, 95L, 1.0, java.sql.Timestamp.valueOf("2025-09-01 00:00:00")),
      ("p", 100L, 96L, 1.0, java.sql.Timestamp.valueOf("2025-09-02 00:00:00")),
      ("p", 100L, 94L, 1.0, java.sql.Timestamp.valueOf("2025-09-03 00:00:00")),
      ("p", 100L, 50L, 1.0, java.sql.Timestamp.valueOf("2025-09-04 00:00:00")))
      .toDF("pipeline", "records", "valid_records", "duration_sec", "run_at")
    val t = Rules.trend(meta, lastN = 10).head()
    assert(t.getAs[Long]("n_runs") == 4)
    assert(t.getAs[Double]("latest_rate") == 0.5)
    assert(t.getAs[Double]("min_rate") == 0.5)
    assert(t.getAs[Boolean]("degrading"))
    // stable history: not degrading
    val stable = Rules.trend(meta.filter(col("valid_records") > 90)).head()
    assert(!stable.getAs[Boolean]("degrading"))
  }

  test("qualitySummary (V14): severity counts, score, recommendation") {
    val df = Seq(
      (Some("u1"), 5.0), (None, 5.0), (None, 99.0), (Some("u4"), 99.0))
      .toDF("u", "v")
    val rules = Seq(
      Rule("u_req", Critical, Rules.required(col("u"))),
      Rule("v_rng", Error, Rules.numericRange(col("v"), 0, 10)))
    val s = Rules.qualitySummary(df, rules).head()
    // 2 critical fails (null u) + 2 error fails (v=99)
    assert(s.getAs[Long]("total_validation_issues") == 4)
    assert(s.getAs[Long]("critical_issues") == 2)
    assert(s.getAs[Long]("error_issues") == 2)
    // 100 - 2*10 - 2*5 = 70
    assert(s.getAs[Long]("quality_score") == 70)
    assert(s.getAs[String]("recommendation").startsWith("CRITICAL"))

    // clean batch: full score, GOOD recommendation
    val clean = Rules.qualitySummary(
      Seq((Some("u"), 1.0)).toDF("u", "v"), rules).head()
    assert(clean.getAs[Long]("quality_score") == 100)
    assert(clean.getAs[String]("recommendation").startsWith("GOOD"))

    // score floors at 0 (11 critical fails > 100 points)
    val awful = Rules.qualitySummary(
      (1 to 11).map(_ => (None: Option[String], 1.0)).toDF("u", "v"),
      rules).head()
    assert(awful.getAs[Long]("quality_score") == 0)
  }

  test("topFailingRules (V13): ranked, zero-fail rules excluded") {
    val df = Seq(
      (None, -1.0), (None, -2.0), (Some("u3"), -3.0), (Some("u4"), 5.0))
      .toDF("u", "v")
    val rules = Seq(
      Rule("u_req", Critical, Rules.required(col("u"))),
      Rule("v_rng", Error, Rules.numericRange(col("v"), 0, 10)),
      Rule("never_fails", Warning, lit(true)))
    val top = Rules.topFailingRules(df, rules).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("v_rng", "u_req"))
    assert(top.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    // limit applies
    assert(Rules.topFailingRules(df, rules, n = 1).count() == 1)
  }

  test("countryCode (V10): shipped ISO-3166 set, case-insensitive") {
    val df = Seq(Some("US"), Some("de"), Some("XX"), Some(""), None)
      .toDF("cc")
      .select(Rules.countryCode(col("cc")).as("ok"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, false, false, true))
    assert(Rules.iso2Codes.size == 249)
    assert(Rules.iso2Codes.distinct.size == 249)
  }

  test("timestampValid classifies garbage instead of throwing (ANSI mode)") {
    // to_timestamp throws CAST_INVALID_INPUT under ANSI (Spark 4
    // default); the validator must return false, not crash
    val got = Seq(Some("2024-01-15 10:30:00"), Some("not-a-timestamp"),
        None)
      .toDF("t")
      .select(Rules.timestampValid(col("t")).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, true))
  }
}
