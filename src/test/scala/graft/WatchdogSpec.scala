package graft

import org.apache.spark.sql.functions._

/** [[graft.Watchdog]] — the harness's per-query blast-radius bound. */
class WatchdogSpec extends SparkSpec {

  test("successful body returns None") {
    assert(Watchdog.run(spark, "ok", 60) {
      spark.range(10).count(): Unit
    }.isEmpty)
  }

  test("throwing body surfaces the error, not a crash") {
    val err = Watchdog.run(spark, "boom", 60) {
      throw new IllegalStateException("synthetic failure")
    }
    assert(err.exists(_.contains("IllegalStateException")))
    assert(err.exists(_.contains("synthetic failure")))
  }

  test("hung Spark job times out and the group is cancelled") {
    val t0 = System.nanoTime()
    val err = Watchdog.run(spark, "hang", 2) {
      // each row sleeps inside a FILTER (count() would prune a bare
      // projection), nondeterministic so it can't be optimized away:
      // the stage cannot finish inside the limit
      val slow = udf((x: Long) => { Thread.sleep(500); x >= 0 })
        .asNondeterministic()
      spark.range(1000).repartition(2)
        .filter(slow(col("id"))).count(): Unit
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(err.exists(_.contains("watchdog timeout")), err)
    // returned promptly (cancel, not wait-for-completion: 1000 rows
    // x 500ms would be minutes)
    assert(elapsed < 30, s"took ${elapsed}s")
    // the session stays usable for the NEXT query (the whole point)
    assert(spark.range(5).count() == 5)
  }
}
