package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located bucketed join (SURVEY §2.7): both sides bucketed by the
  * join key → the executed plan has NO shuffle exchange. This is the
  * plan-shape contract that makes recurring fact-fact joins viable at
  * 100 TB; asserting on the plan (not just the result) pins it.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val orders = (1 to 500).map(i => (i.toLong, s"o$i", i % 7))
      .toDF("okey", "oname", "oprio")
    val items = (1 to 2000).map(i => (i.toLong % 500 + 1, i.toLong, i * 1.5))
      .toDF("okey", "ikey", "amount")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "orders_b", "okey", 4)
      Bucketing.writeBucketed(items, "items_b", "okey", 4)
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "items_b", "okey")

      // correctness: every item matches exactly one order
      assert(joined.count() == 2000)
      val sums = joined.groupBy(col("okey")).agg(count(lit(1)).as("n"))
      assert(sums.agg(sum(col("n"))).head().getLong(0) == 2000)

      // plan shape: bucketing elides ALL shuffle exchanges
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS items_b")
    }
  }
}
