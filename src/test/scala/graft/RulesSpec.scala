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
  }
}
