package graft

import org.apache.spark.sql.functions._

import graft.functions.Intervals

/** [[graft.functions.Intervals.rangeJoin]] — boundary inclusivity,
  * bucket-straddle coverage, and the no-nested-loop plan shape. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // window [t-100, t): right rows 100 before, exclusive of t itself
  private def join(l: Seq[(Long, String, Long)],
                   r: Seq[(String, Long)]) =
    Intervals.rangeJoin(
      l.toDF("id", "key", "us"), r.toDF("key", "us"),
      keys = Seq("key"), leftTsUs = "us", rightTsUs = "us",
      lowerUs = -100L, upperUs = 0L)

  test("boundaries: lower inclusive, upper exclusive, key must match") {
    val out = join(
      Seq((1L, "a", 1000L)),
      Seq(("a", 900L),  // == t-100: IN (lower inclusive)
          ("a", 899L),  // < t-100: out
          ("a", 999L),  // in
          ("a", 1000L), // == t: OUT (upper exclusive)
          ("b", 950L))) // wrong key
      .select("r_us").as[Long].collect().sorted
    assert(out.toSeq == Seq(900L, 999L))
  }

  test("matches survive bucket straddling (window crosses bucket edge)") {
    // width=100 buckets; left at us=150 has window [50,150) crossing
    // the bucket-100 boundary — both sides must be found
    val out = join(
      Seq((1L, "a", 150L)),
      Seq(("a", 60L), ("a", 140L), ("a", 150L)))
      .select("r_us").as[Long].collect().sorted
    assert(out.toSeq == Seq(60L, 140L))
  }

  test("plans as an equi-join (hash/merge), never a nested loop") {
    val l = (0L until 1000L).map(i => (i, s"k${i % 50}", i * 37)).toDF("id", "key", "us")
    val r = (0L until 1000L).map(i => (s"k${i % 50}", i * 41)).toDF("key", "us")
    val plan = Intervals.rangeJoin(l, r, Seq("key"), "us", "us",
      -500L, 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("randomized differential: rangeJoin == naive filtered product") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val (lo, hi) = {
        val a = rnd.nextInt(200) - 100
        val b = a + 1 + rnd.nextInt(150)
        (a.toLong, b.toLong)
      }
      val lRows = Seq.tabulate(150)(i =>
        (i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong))
      val rRows = Seq.tabulate(150)(i =>
        (s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong, i.toLong))
      val got = Intervals.rangeJoin(
          lRows.toDF("id", "key", "us"), rRows.toDF("key", "us", "rid"),
          Seq("key"), "us", "us", lo, hi)
        .select("id", "r_rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naive = (for {
        (id, lk, lt) <- lRows
        (rk, rt, rid) <- rRows
        if lk == rk && rt >= lt + lo && rt < lt + hi
      } yield (id, rid)).sorted
      assert(got == naive, s"trial $trial window [$lo,$hi)")
    }
  }

  test("partition-order independence") {
    val l = (0L until 500L).map(i => (i, s"k${i % 20}", i * 37)).toDF("id", "key", "us")
    val r = (0L until 500L).map(i => (s"k${i % 20}", i * 41)).toDF("key", "us")
    def run(n: Int) = Intervals.rangeJoin(
        l.repartition(n), r.repartition(n), Seq("key"), "us", "us",
        -500L, 0L)
      .select("id", "r_us").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(run(1) == run(32) && run(1).nonEmpty)
  }
}
