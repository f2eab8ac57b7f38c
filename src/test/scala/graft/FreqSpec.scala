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

  test("guaranteedRecall: no true heavy hitter is dropped undersized") {
    val n = skewed.count()
    val truth = exact
    for (k <- Seq(4, 8, 16); threshold <- Seq(30L, 100L, 300L)) {
      val got = Freq.heavyHitters(skewed, col("key"), k, threshold,
        guaranteedRecall = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // recall holds above the sketch resolution n/(k+1): every key
      // with TRUE count >= threshold is present (below the resolution
      // no size-k sketch can promise anything — the documented
      // sizing contract)
      if (threshold > n / (k + 1))
        truth.filter(_._2 >= threshold).keys.foreach { key =>
          assert(got.contains(key),
            s"k=$k t=$threshold lost true heavy hitter $key")
        }
      // precision band: nothing below threshold - n/(k+1) survives
      got.foreach { case (key, est) =>
        assert(est >= threshold - n / (k + 1),
          s"k=$k t=$threshold key=$key below the widened cut")
      }
    }
  }

  test("heavyHittersBy: per-group exact regime equals grouped counts") {
    import spark.implicits._
    // two groups with different skew; keyspace 1..40 per group
    val grouped = skewed.withColumn("g", lit("a"))
      .unionByName((1 to 20).flatMap(i => Seq.fill(i)(i.toLong))
        .toDF("key").withColumn("g", lit("b")))
    val got = Freq.heavyHittersBy(grouped, Seq(col("g")), col("key"),
      k = 64, threshold = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = grouped.groupBy("g", "key").count()
      .filter(col("count") >= 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
    // per-group error bound: group b's n is ITS OWN item count, so an
    // undersized run of group b alone matches the grouped run's b slice
    val bAlone = Freq.heavyHitters(grouped.filter(col("g") === "b")
      .select("key"), col("key"), k = 6, threshold = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bGrouped = Freq.heavyHittersBy(grouped, Seq(col("g")), col("key"),
      k = 6, threshold = 1L)
      .filter(col("g") === "b")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bGrouped.keySet.nonEmpty && bGrouped.size <= 6)
    // both are valid MG summaries of the same stream: same n bound
    val nB = grouped.filter(col("g") === "b").count()
    val truthB = grouped.filter(col("g") === "b").groupBy("key").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (bAlone.toSeq ++ bGrouped.toSeq).foreach { case (key, est) =>
      assert(est <= truthB(key) && truthB(key) - est <= nB / 7)
    }
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
