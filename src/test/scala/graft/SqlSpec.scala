package graft

/** The `spark.sql` front door: registered views give SQL users the
  * same tables, values, and physical plans as the DataFrame API. */
class SqlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SQL over registered views matches the DataFrame plan results") {
    Tables.registerViews(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toString).toSeq
    val df = graft.queries.CoreQueries.q01.run(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("events view carries the ns->us timestamp normalization") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      "SELECT CAST(MIN(ts) AS LONG) FROM events").head.getLong(0)
    val viaDf = Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("ts").cast("long")))
      .head.getLong(0)
    assert(viaSql == viaDf)
  }

  test("SQL window + join plan stays broadcast for a small dimension") {
    Tables.registerViews(spark, dir)
    val q = spark.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS n
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(q.collect().map(_.getLong(1)).sum ==
      Tables.orders(spark, dir).count())
  }
}
