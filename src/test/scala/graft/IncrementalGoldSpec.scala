package graft

import org.apache.spark.sql.functions._

import graft.gold.IncrementalGold

/** Incremental gold maintenance == from-scratch recompute, exactly. */
class IncrementalGoldSpec extends SparkSpec {

  private lazy val events =
    Tables.events(spark, "/root/testdata/sf0.001")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    IncrementalGold.report(df)
      .orderBy("user_id").collect().map(_.toString).toSeq

  test("two-batch incremental merge equals one-shot aggregation") {
    val cut = to_date(col("ts")) < "2024-01-15"
    val b1 = events.filter(cut)
    val b2 = events.filter(!cut)
    assert(b1.count() > 0 && b2.count() > 0) // both halves populated

    val oneShot = IncrementalGold.partials(events)
    val incr = IncrementalGold.merge(IncrementalGold.partials(b1),
      IncrementalGold.partials(b2))
    // counts/sums exact; HLL union associative -> identical estimates
    assert(canon(incr) == canon(oneShot))
  }

  test("versioned state run() folds batches and never rewrites v=N") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ig").toString
    val cut = to_date(col("ts")) < "2024-01-15"
    assert(IncrementalGold.run(spark, events.filter(cut), dir) == 0)
    assert(IncrementalGold.run(spark, events.filter(!cut), dir) == 1)
    val got = IncrementalGold.currentReport(spark, dir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(got == canon(IncrementalGold.partials(events)))
    // v=0 still present: a crashed run can always fall back
    assert(new java.io.File(s"$dir/v=0").exists())
  }

  test("approx_days_active tracks the exact distinct within HLL error") {
    val exact = events.groupBy("user_id")
      .agg(countDistinct(to_date(col("ts"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = IncrementalGold.report(
      IncrementalGold.partials(events))
      .select("user_id", "approx_days_active")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (u, a) =>
      val e = exact(u)
      assert(math.abs(a - e).toDouble <= math.max(2.0, 0.05 * e),
        s"user $u: approx $a vs exact $e")
    }
  }
}
