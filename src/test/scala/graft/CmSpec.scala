package graft

import org.apache.spark.sql.functions._

import graft.functions.Cm

/** Count-min sketch (q152's kernel): the overestimate-only contract,
  * the collision error bound on skewed random data, merge-by-union
  * (the groupBy-sum form is trivially mergeable — pinned so a future
  * rewrite into buffered form keeps it), and min-row exactness in the
  * wide-matrix regime. */
class CmSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic skewed stream: key k appears (k % 13) + 1 times,
  // k in 0..199 -> n = 200 avg 7 = 1400 items over 200 distinct keys.
  private val stream = (0L until 200L)
    .flatMap(k => Seq.fill((k % 13).toInt + 1)(k))
  private val df = stream.toDF("key")
  private val truth = stream.groupBy(identity).map {
    case (k, v) => k -> v.size.toLong
  }

  test("estimates never understate, and min-over-rows bounds the error") {
    val d = 4; val w = 32
    val cells = Cm.sketch(df, col("key"), d, w)
    val probes = truth.toSeq.toDF("key", "true_cnt")
    val est = Cm.estimate(cells, probes, d, w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(est.size == 200)
    est.foreach { case (k, (t, e)) =>
      assert(e >= t, s"understated key $k: est $e < true $t")
    }
    // expected overcount per row is ~(n - t)/w; the min over d rows
    // sits well under it — pin 3n/w as a loose deterministic ceiling
    val n = stream.size
    val worst = est.values.map { case (t, e) => e - t }.max
    assert(worst <= 3L * n / w, s"worst overcount $worst > ${3L * n / w}")
  }

  test("sketch of a union equals cell-wise sum of the part sketches") {
    val d = 2; val w = 16
    val (a, b) = stream.splitAt(700)
    val merged = Cm.sketch(a.toDF("key"), col("key"), d, w)
      .unionByName(Cm.sketch(b.toDF("key"), col("key"), d, w))
      .groupBy(col("d"), col("bucket")).agg(sum(col("c")).as("c"))
    val whole = Cm.sketch(df, col("key"), d, w)
    assert(merged.join(whole, Seq("d", "bucket"))
      .filter(merged("c") =!= whole("c")).isEmpty)
    assert(merged.count() == whole.count())
  }

  test("unseen probe keys estimate 0 when any of their cells is untouched") {
    // 200 keys over 4096 buckets leave most cells empty: a probe key
    // outside the stream almost surely owns an untouched cell, and
    // the LEFT-join estimate must return 0 for it — an inner join
    // would min over only its populated cells and overstate.
    val cells = Cm.sketch(df, col("key"), 4, 4096)
    val unseen = (1000L until 1100L).toDF("key")
    val ests = Cm.estimate(cells, unseen, 4, 4096)
      .select("est").as[Long].collect()
    assert(ests.count(_ == 0L) >= 95, s"nonzero unseen ests: ${ests.count(_ != 0)}")
  }

  test("wide-matrix regime: estimates are exact") {
    // 200 keys across 4096 buckets x 4 rows: some single row may
    // collide, but the min over 4 independent rows is collision-free
    // on this fixed fixture - exactness holds and is deterministic.
    val cells = Cm.sketch(df, col("key"), 4, 4096)
    val probes = truth.toSeq.toDF("key", "true_cnt")
    val bad = Cm.estimate(cells, probes, 4, 4096)
      .filter(col("est") =!= col("true_cnt")).count()
    assert(bad == 0)
  }

  test("F2 inner-product estimate overestimates, tightens with width (q171)") {
    // self-join size: per row d, sum-of-cell-squares >= sum of c(k)^2
    // ((a+b)^2 >= a^2 + b^2 for counts), so the min over rows still
    // overestimates. Unlike POINT estimates (exact when each key has
    // one clean cell in SOME row), F2 exactness would need one row
    // with zero collisions across ALL keys — a birthday-bound event
    // even at w >> keys — so the wide regime is pinned to a 1% ceiling
    // on this deterministic fixture, not equality.
    val exact = truth.values.map(c => c * c).sum
    def f2(w: Int): Long = Cm.sketch(df, col("key"), 4, w)
      .groupBy(col("d")).agg(sum(col("c") * col("c")).as("s"))
      .agg(min(col("s"))).collect()(0).getLong(0)
    assert(f2(32) >= exact)
    assert(f2(256) >= exact && f2(256) <= f2(32))
    assert(f2(4096) >= exact && f2(4096) - exact <= exact / 100)
  }
}
