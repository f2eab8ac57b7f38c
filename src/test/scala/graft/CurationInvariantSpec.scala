package graft

import org.apache.spark.sql.functions.col

import graft.queries.{TextQueries, TrainQueries, VectorQueries}

/** Structural invariants of the round-9 curation operators — the
  * properties the DuckDB hash gate can't express (it proves the two
  * engines agree; these prove the agreed-on numbers MEAN what the
  * operator claims). All on sf0.001, deterministic data, so every
  * assertion is a tight regression pin.
  */
class CurationInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q307 farthest-first covering radius is monotone nonincreasing") {
    val rows = VectorQueries.q307.run(spark, sf)
      .orderBy("round").collect()
    assert(rows.length == 8)
    val radii = rows.map(_.getAs[Long]("radius_d2"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius grew: $a -> $b")
    }
    // 8 distinct centers (greedy never re-picks a covered point)
    assert(rows.map(_.getAs[Long]("center_id")).distinct.length == 8)
  }

  test("q311 EM separates matches from non-matches unsupervised") {
    val rows = TextQueries.q311.run(spark, sf).collect()
    val byPattern = rows.map { r =>
      ((r.getAs[Long]("a_title"), r.getAs[Long]("a_lang"),
        r.getAs[Long]("a_source"), r.getAs[Long]("a_ncb")),
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
          r.getAs[Long]("post_ppm")))
    }.toMap
    // the all-agree pattern holds the planted matches and EM drives
    // its posterior high WITHOUT seeing mt
    val (nAll, tAll, postAll) = byPattern((1L, 1L, 1L, 1L))
    assert(tAll > 0 && postAll > 900000L,
      s"all-agree posterior $postAll")
    // the all-disagree pattern is pure non-match and scores near zero
    byPattern.get((0L, 0L, 0L, 0L)).foreach { case (_, t, post) =>
      assert(t == 0L && post < 100000L, s"all-disagree posterior $post")
    }
    // posterior-weighted recall: patterns EM links (post >= 0.5)
    // must capture every planted true match
    val linkedTrue = rows.filter(_.getAs[Long]("post_ppm") >= 500000L)
      .map(_.getAs[Long]("n_true")).sum
    val allTrue = rows.map(_.getAs[Long]("n_true")).sum
    assert(linkedTrue == allTrue,
      s"EM-linked patterns hold $linkedTrue of $allTrue true matches")
  }

  test("q312 ESS is monotone nonincreasing in temperature and <= n") {
    val rows = TrainQueries.q312.run(spark, sf).orderBy("t").collect()
    assert(rows.length == 3)
    val n = rows.head.getAs[Long]("n")
    val ess = rows.map(_.getAs[Long]("ess"))
    ess.foreach(e => assert(e >= 1L && e <= n))
    // sharper temperature concentrates mass on long docs -> ESS falls
    ess.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"ESS grew with temperature: $a -> $b")
    }
  }

  test("q310 iid splits read as the quantization floor on both axes") {
    val rows = VectorQueries.q310.run(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_gap_sq")
      val mom = r.getAs[Long]("moment_gap_sq")
      assert(mean >= 0L && mom >= 0L)
      // no drift is planted, so the gap is SAMPLING noise: unit-vector
      // coordinates spread ≈ 1000/√d = 125 milli, so the expected iid
      // mean gap is d·σ²·(1/n_a+1/n_b) ≈ 64·125²·(1/134+1/66) ≈ 23 k
      // at sf0.001 (measured 10.4 k). A real mean shift of even 0.1
      // in cosine terms lands at d·(100 milli)² = 640 k — order(s)
      // above. Pin the iid rows under 100 k: deterministic data makes
      // this a stable regression bound with 6× headroom to noise and
      // 6× margin below the smallest interesting drift.
      assert(mean < 100000L, s"iid mean gap $mean reads as drift")
    }
  }

  test("q314 LOO deltas and exclusive vocab are conservation-consistent") {
    val rows = TrainQueries.q314.run(spark, sf).collect()
    val shareSum = rows.map(_.getAs[Long]("token_share_ppm")).sum
    // floored ppm shares sum to <= 1e6, within |D| of it
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    // exclusive vocabularies are disjoint by construction, so their
    // sum cannot exceed the corpus type count
    val tokCount = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("t"))
      .select("t").distinct().count()
    assert(rows.map(_.getAs[Long]("vocab_exclusive")).sum <= tokCount)
  }
}
