package graft

import org.apache.spark.sql.functions._

import graft.functions.Freq

/** Misra–Gries heavy-hitter summary: exact when capacity exceeds the
  * keyspace (the regime q121's oracle pins), deterministic lower
  * bounds within n/(k+1) when undersized, partitioning-independent in
  * the exact regime. */
class FreqSpec extends SparkSpec {

  // Zipf-ish skew: key i appears ~ 600/i times, keys 1..40
  private lazy val skewed = {
    import spark.implicits._
    (1 to 40).flatMap(i => Seq.fill(600 / i)(i.toLong))
      .toDF("key").repartition(7)
  }

  private def exact: Map[Long, Long] = skewed.groupBy("key").count()
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("exact regime (k >= distinct): equals groupBy counts") {
    val got = Freq.heavyHitters(skewed, col("key"), k = 64, threshold = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("exact regime is partitioning-independent") {
    def run(n: Int) = Freq.heavyHitters(
      skewed.repartition(n), col("key"), 64, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("undersized: estimates are lower bounds within n/(k+1)") {
    val n = skewed.count()
    val truth = exact
    for (k <- Seq(4, 8, 16)) {
      val got = Freq.heavyHitters(skewed, col("key"), k, 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      got.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"k=$k key=$key overcounted")
        assert(t - est <= n / (k + 1), s"k=$k key=$key bound")
      }
      // no true heavy hitter (count > n/(k+1)) can be missing entirely
      truth.filter(_._2 > n / (k + 1)).keys.foreach { key =>
        assert(got.contains(key), s"k=$k lost heavy key $key")
      }
    }
  }

  test("threshold filters on the stored estimate") {
    val got = Freq.heavyHitters(skewed, col("key"), 64, 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact.filter(_._2 >= 100L))
  }

  test("non-castable keys are dropped, not crashed on (ANSI-safe)") {
    import spark.implicits._
    val d = Seq("12", "twelve", "12", "7", null).toDF("key")
    val got = Freq.heavyHitters(d, col("key"), 8, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(12L -> 2L, 7L -> 1L))
  }

  test("null keys are ignored") {
    import spark.implicits._
    val d = Seq(Some(1L), None, Some(1L), Some(2L), None)
      .toDF("key")
    val got = Freq.heavyHitters(d, col("key"), 8, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
