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

  test("q312 DECIMAL(38) escape hatch is exact past the int64 bound") {
    // q312 documents its int64 headroom and promises "beyond that the
    // same query runs on DECIMAL(38)/HUGEINT sums". Prove the hatch:
    // synthesize weights big enough that a single w² overflows int64
    // (n_chars = 160k at T=3 → w ≈ 4.1·10⁹, w² ≈ 1.7·10¹⁹ > 2⁶³;
    // the per-row cube 4.1·10¹⁵ still fits, so only the SUM spills),
    // run
    // the identical ESS arithmetic on DECIMAL(38,0) sums, and check
    // it against driver-side BigInt — while the int64 path visibly
    // corrupts.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nChars = (0 until 40).map(i => 160000L + 197L * i)
    val df = nChars.toDF("n_chars").repartition(4)
    // q312's T=3 per-row weight (int64-safe per row: 160k³ ≈ 4.1e15)
    val w = expr("(n_chars * n_chars * n_chars) div 1000000L")
    val dec = df.select(w.cast("decimal(38,0)").as("w"))
      .agg(sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sw2"),
        count(lit(1)).as("n"))
      .select(expr("(sw * sw) div sw2").as("ess")).head()
    val wExact = nChars.map(c => BigInt(c) * c * c / 1000000)
    val expected =
      (wExact.sum * wExact.sum / wExact.map(x => x * x).sum).toLong
    assert(dec.getLong(0) == expected,
      s"decimal ESS ${dec.getLong(0)} != BigInt $expected")
    // and the int64 path really is past its bound here: under ANSI
    // (the session default) the long Σw² aborts with an arithmetic
    // overflow — the loud form of the spillover the hatch escapes
    val ex = intercept[Exception] {
      df.select(w.as("w"))
        .agg(sum(col("w") * col("w")).as("sw2")).head().getLong(0)
    }
    assert(ex.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"int64 Σw² did not overflow — fixture no longer past the bound" +
        s" (${ex.getMessage.take(80)})")
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

  test("q313b assignment packs within capacity and re-prices q313") {
    val asg = TrainQueries.q313b.run(spark, sf).collect()
    // every doc placed exactly once
    assert(asg.map(_.getAs[Long]("doc_id")).distinct.length == asg.length)
    // per (class, bin): occupancy <= docs_per_bin and token mass
    // (class-rounded) <= capacity 128; slots are 0..occupancy-1
    asg.groupBy(r => (r.getAs[Long]("cls"), r.getAs[Long]("bin_id")))
      .foreach { case ((cls, bin), rs) =>
        val dpb = 128L / cls
        assert(rs.length <= dpb, s"bin ($cls,$bin) holds ${rs.length}")
        assert(rs.length * cls <= 128L)
        assert(rs.map(_.getAs[Long]("slot")).sorted.toSeq ==
          (0L until rs.length).toSeq, s"slot gap in ($cls,$bin)")
        rs.foreach(r => assert(r.getAs[Long]("nt") <= cls))
      }
    // the materialized assignment re-prices the q313 census exactly:
    // same per-class doc count and bin count
    val census = TrainQueries.q313.run(spark, sf).collect()
      .map(r => r.getAs[Long]("cls") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bins"))).toMap
    asg.groupBy(_.getAs[Long]("cls")).foreach { case (cls, rs) =>
      val (nDocs, bins) = census(cls)
      assert(rs.length == nDocs, s"class $cls docs ${rs.length}")
      assert(rs.map(_.getAs[Long]("bin_id")).distinct.length == bins,
        s"class $cls bins")
      // contiguous bin ids 0..bins-1 (shelf scheme leaves no hole)
      assert(rs.map(_.getAs[Long]("bin_id")).max == bins - 1)
    }
  }

  test("q315 UniMax allocation respects budget, caps, and water level") {
    val rows = TrainQueries.q315.run(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n_tok")).sum
    val b = 3L * n / 2L
    val alloc = rows.map(_.getAs[Long]("alloc_tokens"))
    // budget never exceeded; floor slack < |languages| tokens
    assert(alloc.sum <= b && b - alloc.sum < rows.length.toLong,
      s"allocated ${alloc.sum} of $b")
    rows.foreach { r =>
      // epoch cap holds everywhere; capped rows get exactly their cap
      assert(r.getAs[Long]("epochs_ppm") <= 2000000L)
      if (r.getAs[Long]("is_capped") == 1L)
        assert(r.getAs[Long]("alloc_tokens") ==
          r.getAs[Long]("cap_tokens"))
    }
    // uncapped rows all sit at ONE water level
    val levels = rows.filter(_.getAs[Long]("is_capped") == 0L)
      .map(_.getAs[Long]("alloc_tokens")).distinct
    assert(levels.length <= 1, s"water levels $levels")
    // non-degenerate on this corpus: both capped and uncapped exist
    assert(rows.exists(_.getAs[Long]("is_capped") == 1L) &&
      rows.exists(_.getAs[Long]("is_capped") == 0L))
  }

  test("q316 power iteration stays sup-normalized and contracts") {
    val rows = VectorQueries.q316.run(spark, sf).collect()
    val byRound = rows.groupBy(_.getAs[Long]("round"))
    assert(byRound.keySet == Set(1L, 2L, 3L))
    byRound.foreach { case (r, rs) =>
      assert(rs.length == 64)
      assert(rs.map(x => math.abs(x.getAs[Long]("v_milli"))).max == 1000L,
        s"round $r not sup-normalized")
      assert(rs.head.getAs[Long]("lambda_micro") > 0L)
    }
    def vec(r: Long) = byRound(r).map(x =>
      (x.getAs[Long]("pos"), x.getAs[Long]("v_milli"))).toMap
    def l1(a: Map[Long, Long], b: Map[Long, Long]) =
      a.keys.map(k => math.abs(a(k) - b(k))).sum
    // successive iterates contract toward the dominant eigenvector
    assert(l1(vec(3), vec(2)) <= l1(vec(2), vec(1)),
      s"no contraction: ${l1(vec(2), vec(1))} -> ${l1(vec(3), vec(2))}")
  }

  test("q317/q318 censuses partition the corpus exactly") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val carto = TrainQueries.q317.run(spark, sf).collect()
    assert(carto.map(_.getAs[Long]("n_docs")).sum == nDocs)
    carto.foreach { r =>
      assert(r.getAs[Long]("n_label_pos") <= r.getAs[Long]("n_docs"))
      val mu = r.getAs[Long]("mu_band")
      assert(mu >= 0L && mu <= 10L)
    }
    val cj = TrainQueries.q318.run(spark, sf).collect()
    assert(cj.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // floored ppm shares sum to <= 1e6, within |cells| of it
    val shares = cj.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares > 1000000L - cj.length)
    // every confident cell is one of the five legal (y, yhat) pairs
    cj.foreach { r =>
      assert(Set(0L, 1L).contains(r.getAs[Long]("y")))
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("yhat_conf")))
    }
  }

  test("q319 self-influence census partitions the corpus, bands ordered") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val rows = TrainQueries.q319.run(spark, sf)
      .orderBy("si_band").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // non-degenerate ladder (the reason the 1-3-10 bands exist)
    assert(rows.length >= 3, s"only ${rows.length} bands")
    // per-band max is monotone in the band — the ladder is an order
    val maxes = rows.map(_.getAs[Long]("si_max"))
    maxes.sliding(2).foreach { case Array(a, b) => assert(a < b) }
  }

  test("q320 IPF raking hits the column marginals and levels rows") {
    val rows = TrainQueries.q320.run(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    val nSrc = rows.map(_.getAs[String]("source")).distinct.length
    val nLang = rows.map(_.getAs[String]("lang")).distinct.length
    val rt = 1000000L * nDocs / nSrc
    val ct = 1000000L * nDocs / nLang
    // the final sweep ends on a column step: colsums exact to floor
    // slack (< |S| per column)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      val cs = rs.map(_.getAs[Long]("fitted_micro")).sum
      assert(ct - cs >= 0 && ct - cs < nSrc.toLong, s"colsum $l = $cs")
    }
    // rows are LEVELED (within 2% of target after two sweeps) even
    // though only columns are exact — the raking trade-off
    rows.groupBy(_.getAs[String]("source")).foreach { case (s0, rs) =>
      val rsum = rs.map(_.getAs[Long]("fitted_micro")).sum
      assert(math.abs(rsum - rt) <= rt / 50, s"rowsum $s0 = $rsum")
    }
  }

  test("q321 greedy coverage has diminishing returns and exact cumsum") {
    val rows = TrainQueries.q321.run(spark, sf).orderBy("round").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // greedy on a submodular objective: marginal gains nonincreasing
    val gains = rows.map(_.getAs[Long]("gain_new_types"))
    gains.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"gain grew: $a -> $b")
    }
    // covered_total is exactly the running gain sum; no double count
    assert(rows.map(_.getAs[Long]("covered_total")).toSeq ==
      gains.scanLeft(0L)(_ + _).tail.toSeq)
    // distinct sources, coverage within [0, 1e6]
    assert(rows.map(_.getAs[String]("source")).distinct.length ==
      rows.length)
    rows.foreach(r =>
      assert(r.getAs[Long]("coverage_ppm") <= 1000000L))
  }

  test("q322 Kendall pair masses satisfy the tau-b pair identity") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.CoreQueries.q322.run(spark, sf).collect().head
    val (n, c, dd, tx, ty) = (r.getAs[Long]("n_parts"),
      r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
      r.getAs[Long]("ties_x"), r.getAs[Long]("ties_y"))
    // rebuild the joint census to get Txy (pairs tied in BOTH — the
    // one mass the query doesn't emit) and close the exact identity
    // n(n-1)/2 = C + D + Tx + Ty - Txy
    val cells = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("pk")).agg(count(lit(1)).as("freq"))
      .join(Tables.part(spark, sf), col("pk") === col("p_partkey"))
      .select(
        expr("(cast(floor(p_retailprice * 100 + 0.5) as bigint)" +
          " - 90000L) div 1000").as("bx"),
        expr("least(freq div 8, 15L)").as("yv"))
      .groupBy("bx", "yv").agg(count(lit(1)).as("c"))
    val txy = cells.select(expr("sum(c * (c - 1L) div 2)").as("t"))
      .collect().head.getAs[Long]("t")
    assert(c + dd + tx + ty - txy == n * (n - 1) / 2,
      s"pair identity: C=$c D=$dd Tx=$tx Ty=$ty Txy=$txy n=$n")
    val tau = r.getAs[Long]("tau_b_milli")
    assert(tau >= -1000L && tau <= 1000L, s"tau out of range: $tau")
  }

  test("q323 Borda census partitions the corpus; spread bounds hold") {
    val rows = TrainQueries.q323.run(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val band = r.getAs[Long]("borda_band")
      assert(band >= 0L && band <= 9L, s"band $band")
      val (nd, ss, ms) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_spread"), r.getAs[Long]("mean_spread"))
      // floored mean brackets the sum; spread < n by rank range
      assert(ms * nd <= ss && ss < (ms + 1) * nd)
      assert(ss <= nd * (nDocs - 1))
      // score bounds: 3 <= score <= 3n
      assert(r.getAs[Long]("min_score") >= 3L &&
        r.getAs[Long]("max_score") <= 3L * nDocs)
    }
  }

  test("q324 curriculum admits in difficulty order and exhausts corpus") {
    val rows = TrainQueries.q324.run(spark, sf).orderBy("epoch").collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val nDocs = Tables.documents(spark, sf).count()
    // cumulative counts are the exact running sum and end at n
    val news = rows.map(_.getAs[Long]("n_new_docs"))
    assert(rows.map(_.getAs[Long]("n_cum_docs")).toSeq ==
      news.scanLeft(0L)(_ + _).tail.toSeq)
    assert(rows.last.getAs[Long]("n_cum_docs") == nDocs)
    // admission is difficulty-ordered: epoch t's hardest newly
    // admitted doc is strictly easier than epoch t+1's easiest
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_difficulty") <
          b.getAs[Long]("min_difficulty"),
          s"epochs overlap: ${a.getAs[Long]("max_difficulty")} vs " +
            s"${b.getAs[Long]("min_difficulty")}")
      case _ => ()
    }
    rows.foreach { r =>
      val e = r.getAs[Long]("epoch")
      assert(e >= 1L && e <= 4L)
      assert(r.getAs[Long]("min_difficulty") <=
        r.getAs[Long]("mean_difficulty") &&
        r.getAs[Long]("mean_difficulty") <=
          r.getAs[Long]("max_difficulty"))
    }
  }

  test("q325 facility-location greedy: diminishing gains, exact cumsum") {
    val rows = VectorQueries.q325.run(spark, sf).orderBy("round").collect()
    assert(rows.length == 4)
    val gains = rows.map(_.getAs[Long]("gain"))
    // submodularity: greedy marginal gains are nonincreasing
    gains.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"gain grew: $a -> $b")
    }
    // the realized objective is exactly the running gain sum
    assert(rows.map(_.getAs[Long]("objective")).toSeq ==
      gains.scanLeft(0L)(_ + _).tail.toSeq)
    // 4 distinct centers, all from the pool; objective nonnegative
    assert(rows.map(_.getAs[Long]("center_id")).distinct.length == 4)
    assert(gains.forall(_ >= 0L))
  }

  test("q326 Chao1 never estimates below the observed vocabulary") {
    val r = TextQueries.q326.run(spark, sf).collect().head
    val (v, f1, f2, n) = (r.getAs[Long]("v_types"), r.getAs[Long]("f1"),
      r.getAs[Long]("f2"), r.getAs[Long]("n_tokens"))
    assert(f1 >= 0 && f2 >= 0 && f1 + f2 <= v && v <= n)
    assert(r.getAs[Long]("chao1_milli") >= 1000L * v)
    val cov = r.getAs[Long]("coverage_ppm")
    assert(cov >= 0L && cov <= 1000000L)
  }

  test("q327 novelty masses conserve: every bigram premieres exactly once") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.q327.run(spark, sf).collect()
    // Σ novel over the whole census = |corpus bigram vocabulary|
    val vocab = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(element_at(toks, i), ' '," +
          " element_at(toks, i + 1)))")).as("b"))
      .select("b").distinct().count()
    assert(rows.map(_.getAs[Long]("sum_novel")).sum == vocab)
    rows.foreach { r =>
      val band = r.getAs[Long]("nov_band")
      assert(band >= 0L && band <= 10L)
      assert(r.getAs[Long]("sum_novel") <= r.getAs[Long]("sum_types"))
    }
  }

  test("q328 Shapley satisfies the efficiency axiom exactly") {
    val rows = TrainQueries.q328.run(spark, sf).collect()
    val L = 232792560L
    // Σ_s φ_s = v(N) = |V|, exactly on the lcm grid
    val phiSum = rows.map(_.getAs[Long]("phi_xl")).sum
    assert(phiSum % L == 0, s"phi sum $phiSum not a multiple of L")
    val v = phiSum / L
    assert(v > 0)
    rows.foreach { r =>
      val (nt, ne, phi) = (r.getAs[Long]("n_types"),
        r.getAs[Long]("n_exclusive"), r.getAs[Long]("phi_xl"))
      // exclusive types contribute L each; shared ones (1/m)·L < L
      assert(ne <= nt)
      assert(phi >= ne * L && phi <= nt * L,
        s"phi $phi outside [${ne}L, ${nt}L]")
    }
  }

  test("q329 knapsack statuses are a monotone ladder within budget") {
    val rows = TrainQueries.q329.run(spark, sf)
      .orderBy(col("ratio_band").desc).collect()
    val total = rows.map(_.getAs[Long]("tokens")).sum
    // cum is the exact running token sum in greedy (density) order
    assert(rows.map(_.getAs[Long]("cum_tokens")).toSeq ==
      rows.map(_.getAs[Long]("tokens")).scanLeft(0L)(_ + _).tail.toSeq)
    val budget = total / 4
    val statuses = rows.map(_.getAs[Long]("status")).toSeq
    // 2s, then at most one 1, then 0s — the greedy admission ladder
    assert(statuses == statuses.sortBy(-_), s"not a ladder: $statuses")
    assert(statuses.count(_ == 1L) <= 1)
    // every fully-admitted prefix fits the budget; adding the first
    // excluded/boundary band overflows it
    rows.zip(statuses).foreach { case (r, st) =>
      if (st == 2L) assert(r.getAs[Long]("cum_tokens") <= budget)
      if (st == 0L)
        assert(r.getAs[Long]("cum_tokens") - r.getAs[Long]("tokens")
          >= budget)
    }
  }

  test("q330 gradient-conflict cosines are bounded and sign-consistent") {
    val rows = TrainQueries.q330.run(spark, sf).collect()
    // 20 sources -> C(20,2) ordered pairs, each exactly once
    assert(rows.length == 190)
    assert(rows.forall(r =>
      r.getAs[String]("src_a") < r.getAs[String]("src_b")))
    rows.foreach { r =>
      val c = r.getAs[Long]("cos_milli")
      assert(c >= -1000L && c <= 1000L, s"cos out of range: $c")
      // conflict flag is exactly the cosine's sign (dab < 0 iff
      // floor(1000 cos) < 0; zero-norm rows emit cos = 0, conflict 0)
      assert((r.getAs[Long]("conflict") == 1L) == (c < 0L))
    }
  }

  test("q331 Hill estimator internal identities hold") {
    val rows = TextQueries.q331.run(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (hsum, hinv, alpha) = (r.getAs[Long]("sum_lnratio_mnat"),
      r.getAs[Long]("hill_inv_mnat"), r.getAs[Long]("alpha_milli"))
    // top-8 frequencies dominate the 9th: every log-ratio >= 0
    assert(hsum >= 0L)
    assert(hinv == hsum / 8)
    assert(alpha == 1000000L / math.max(1L, hinv))
    assert(r.getAs[Long]("f_kplus1") >= 1L)
  }

  test("q332 HT estimate matches an independent stratum-fold replay") {
    import org.apache.spark.sql.functions._
    val r = TrainQueries.q332.run(spark, sf).collect().head
    val st = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long").as("ch"),
        when(size(split(col("text"), " ")) >= 55, 1L).otherwise(0L)
          .as("keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("ns"), sum(col("keep")).as("ks"),
        sum(when(col("keep") === 1L, col("ch")).otherwise(0L)).as("kc"))
      .collect()
    val n = st.map(_.getAs[Long]("ns")).sum
    val htNum = st.filter(_.getAs[Long]("ks") > 0).map(x =>
      x.getAs[Long]("kc") * x.getAs[Long]("ns") / x.getAs[Long]("ks"))
      .sum
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("ht_mean") == htNum / n)
    assert(r.getAs[Long]("n_dead_strata") ==
      st.count(_.getAs[Long]("ks") == 0L))
    // bias columns are the exact differences of the mean columns
    assert(r.getAs[Long]("naive_bias") ==
      r.getAs[Long]("naive_mean") - r.getAs[Long]("true_mean"))
    assert(r.getAs[Long]("ht_bias") ==
      r.getAs[Long]("ht_mean") - r.getAs[Long]("true_mean"))
  }

  test("q333 RHO priorities partition the pool; floored means bracket") {
    import org.apache.spark.sql.functions._
    val rows = TrainQueries.q333.run(spark, sf).collect()
    val nPool = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(2L)) === 1L).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nPool)
    rows.foreach { r =>
      val band = r.getAs[Long]("prio_band")
      assert(band >= -10L && band <= 10L, s"band $band")
      val (n, sp, mp) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_prio"), r.getAs[Long]("mean_prio"))
      // sign-safe floored mean brackets the sum
      assert(mp * n <= sp && sp < (mp + 1) * n, s"mean $mp sum $sp n $n")
      assert(r.getAs[Long]("n_pos") <= n)
    }
  }

  test("q335 reliability census partitions the corpus; ECE replays") {
    val rows = TrainQueries.q335.run(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val eces = rows.map(_.getAs[Long]("ece_ppm")).distinct
    assert(eces.length == 1)
    // ECE is exactly the doc-weighted mean of the per-band gaps
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val wg = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Long]("gap_ppm")).sum
    assert(eces.head == wg / n)
    rows.foreach { r =>
      assert(r.getAs[Long]("conf_band") >= 0L &&
        r.getAs[Long]("conf_band") <= 9L)
      assert(r.getAs[Long]("gap_ppm") ==
        math.abs(r.getAs[Long]("mean_conf_ppm")
          - r.getAs[Long]("pos_rate_ppm")))
      assert(r.getAs[Long]("mean_conf_ppm") <= 1000000L &&
        r.getAs[Long]("pos_rate_ppm") <= 1000000L)
    }
  }

  test("q336 Otsu cut covers all pool sims and orders class means") {
    val r = VectorQueries.q336.run(spark, sf).collect().head
    val nVecs = Tables.embeddings(spark, sf).count()
    // every (vector, pool candidate) pair except the 16 self-pairs
    assert(r.getAs[Long]("n_below") + r.getAs[Long]("n_above") ==
      nVecs * 16 - 16)
    assert(r.getAs[Long]("n_below") > 0 && r.getAs[Long]("n_above") > 0)
    // a threshold split of an ordered grid: below-mean < above-mean
    assert(r.getAs[Long]("mean_band_below") <
      r.getAs[Long]("mean_band_above"))
    val cut = r.getAs[Long]("cut_cos_milli")
    assert(cut >= -1000L && cut <= 1049L)
    assert(r.getAs[Long]("score_floor") >= 0L)
  }

  test("q337 Hill orders are consistent per source") {
    val rows = TextQueries.q337.run(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, q0) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("q0_types"))
      assert(q0 >= 1L && q0 <= n)
      // 1 <= inverse Simpson <= richness (Hill-number ordering)
      val is = r.getAs[Long]("inv_simpson_milli")
      assert(is >= 1000L - 1 && is <= 1000L * q0, s"invSimpson $is q0 $q0")
      assert(r.getAs[Long]("shannon_mnat") >= 0L)
      // Pielou evenness <= 1 up to grid flooring slack
      assert(r.getAs[Long]("evenness_milli") <= 1050L)
    }
  }

  test("q338 SPRT walk replays exactly and the verdict is the first crossing") {
    val rows = graft.queries.QualityQueries.q338.run(spark, sf)
      .orderBy("day").collect()
    assert(rows.length == 30)
    // cumulative LLR is the exact running sum of the daily increments
    val daily = rows.map(_.getAs[Long]("llr_day_mnat"))
    assert(rows.map(_.getAs[Long]("llr_cum_mnat")).toSeq ==
      daily.scanLeft(0L)(_ + _).tail.toSeq)
    // per-row state matches the Wald bounds
    rows.foreach { r =>
      val c = r.getAs[Long]("llr_cum_mnat")
      val expect = if (c >= 2944L) 2L else if (c <= -2944L) 0L else 1L
      assert(r.getAs[Long]("state") == expect)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_events"))
    }
    // the constant verdict columns are the first crossing
    val firstCross = rows.find(r =>
      math.abs(r.getAs[Long]("llr_cum_mnat")) >= 2944L)
    val stopDays = rows.map(_.getAs[java.sql.Date]("stop_day")).distinct
    val stopStates = rows.map(_.getAs[Long]("stop_state")).distinct
    assert(stopDays.length == 1 && stopStates.length == 1)
    firstCross match {
      case Some(fc) =>
        assert(stopDays.head == fc.getAs[java.sql.Date]("day"))
        assert(stopStates.head ==
          (if (fc.getAs[Long]("llr_cum_mnat") >= 2944L) 2L else 0L))
      case None =>
        assert(stopStates.head == 1L)
    }
  }

  test("q339 BBSE moment equation holds within flooring slack") {
    val r = TrainQueries.q339.run(spark, sf).collect().head
    val (c00, c01, c10, c11) = (r.getAs[Long]("c00"), r.getAs[Long]("c01"),
      r.getAs[Long]("c10"), r.getAs[Long]("c11"))
    val (ns, nt) = (r.getAs[Long]("n_src"), r.getAs[Long]("n_tgt"))
    val (m0, m1) = (r.getAs[Long]("m0"), r.getAs[Long]("m1"))
    assert(c00 + c01 + c10 + c11 == ns)
    assert(m0 + m1 == nt)
    // the estimator inverts C exactly: plugging the floored w's back
    // into C·w = 10^6·ns·μ/nt must land within the flooring slack
    val (w0, w1) = (r.getAs[Long]("w0_ppm"), r.getAs[Long]("w1_ppm"))
    val lhs0 = c00 * w0 + c01 * w1
    val rhs0 = 1000000L * ns * m0 / nt
    assert(math.abs(lhs0 - rhs0) <= c00 + c01 + nt,
      s"moment eq: $lhs0 vs $rhs0")
    val lhs1 = c10 * w0 + c11 * w1
    val rhs1 = 1000000L * ns * m1 / nt
    assert(math.abs(lhs1 - rhs1) <= c10 + c11 + nt,
      s"moment eq: $lhs1 vs $rhs1")
  }

  test("q340 risk-coverage staircase partitions and ends at full coverage") {
    val rows = TrainQueries.q340.run(spark, sf)
      .orderBy(col("margin_band").desc).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // coverage is strictly increasing down the ladder and ends at 1
    val covs = rows.map(_.getAs[Long]("coverage_ppm"))
    covs.sliding(2).foreach {
      case Array(a, b) => assert(b > a)
      case _ => ()
    }
    assert(covs.last == 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_errors") <= r.getAs[Long]("n_docs"))
      val risk = r.getAs[Long]("risk_ppm")
      assert(risk >= 0L && risk <= 1000000L)
    }
  }

  test("q341 Brier decomposition closes within flooring slack") {
    val r = TrainQueries.q341.run(spark, sf).collect().head
    val (brier, rel, res, unc, gap) = (r.getAs[Long]("brier_ppm2"),
      r.getAs[Long]("rel_ppm2"), r.getAs[Long]("res_ppm2"),
      r.getAs[Long]("unc_ppm2"), r.getAs[Long]("decomposition_gap_ppm2"))
    val bbin = r.getAs[Long]("brier_binned_ppm2")
    assert(rel >= 0L && res >= 0L && unc >= 0L)
    assert(brier >= 0L && brier <= 1000000000000L)
    // Murphy's identity binds for the BINNED forecaster, up to ppm
    // flooring of the band/base means: the residual is tiny on the
    // ppm^2 scale
    assert(gap == bbin - (rel - res + unc))
    assert(math.abs(gap) <= 5000000L, s"gap $gap")
    // binning loss is the raw-vs-binned difference, exactly
    assert(r.getAs[Long]("binning_loss_ppm2") == brier - bbin)
    // resolution can never exceed the uncertainty it explains
    assert(res <= unc + 5000000L)
  }

  test("q342 power ladder is monotone and the arm split is exhaustive") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.CoreQueries.q342.run(spark, sf)
      .orderBy("mde_ppm").collect()
    assert(rows.length == 4)
    // required n strictly decreases as the detectable effect grows
    val reqs = rows.map(_.getAs[Long]("n_required_per_arm"))
    reqs.sliding(2).foreach { case Array(a, b) => assert(b < a) }
    // powered flag is monotone nondecreasing along the ladder
    val pw = rows.map(_.getAs[Long]("powered"))
    pw.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    // the md5 split is exhaustive over distinct users
    val nUsers = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull).select("user_id").distinct()
      .count()
    assert(rows.head.getAs[Long]("n_arm0")
      + rows.head.getAs[Long]("n_arm1") == nUsers)
    // closed-form replay for the first rung
    val p = rows.head.getAs[Long]("pool_p_ppm")
    val mde = rows.head.getAs[Long]("mde_ppm")
    val num = 7851204L * 2 * p * (1000000L - p)
    val den = 1000000L * mde * mde
    assert(reqs.head == (num + den - 1) / den)
  }

  test("q343 Kish deff >= 1 and n_eff prices the balancing exactly") {
    val r = TrainQueries.q343.run(spark, sf).collect().head
    val (n, deff, neff) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("deff_milli"), r.getAs[Long]("n_eff"))
    // Cauchy-Schwarz: deff >= 1 (up to milli-grid flooring)
    assert(deff >= 999L, s"deff $deff")
    assert(neff <= n && neff >= 1L)
    assert(neff == 1000L * n / math.max(1L, deff))
    assert(r.getAs[Long]("w_min_milli") <= r.getAs[Long]("w_max_milli"))
    assert(r.getAs[Long]("n_cells") == 20L)
  }

  test("q359 kappa census equals the naive 2x2 recomputation (third implementation)") {
    // Engine and oracle share the set-arithmetic shape; this replays
    // the gates and the closed-form kappa per source in plain Scala.
    // Spark's split(text, ' ') keeps trailing empties (limit -1) —
    // the naive twin must match that tokenization exactly.
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      var a1 = 0L; var b1 = 0L; var agree = 0L
      for ((_, nc, t) <- ds) {
        val ga = if (nc >= 280) 1 else 0
        val wc = t.split(" ", -1).length.toLong
        val gb = if (100 * nc / wc >= 560) 1 else 0
        a1 += ga; b1 += gb
        if (ga == gb) agree += 1
      }
      val pn = a1 * b1 + (n - a1) * (n - b1)
      val kappa: Option[Long] =
        if (n * n == pn) None
        else Some(Math.floorDiv(1000000L * (n * agree - pn), n * n - pn))
      src -> (n, a1, b1, agree, kappa)
    }
    val got = TrainQueries.q359.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(got.keySet == bySrc.keySet)
    for ((src, exp) <- bySrc) assert(got(src) == exp, s"source $src")
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

  test("q347 EL2N ladder: cumulative columns monotone, full coverage " +
      "at band 0, data-diet separation (coverage above keep share)") {
    val rows = TrainQueries.q347.run(spark, sf)
      .orderBy(col("el2n_band").desc).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_mis_final") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("mis_rate_ppm") <= 1000000L)
    }
    // descending the ladder keeps more docs and covers more errors
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("keep_frac_ppm")
          <= b.getAs[Long]("keep_frac_ppm"))
        assert(a.getAs[Long]("err_coverage_ppm")
          <= b.getAs[Long]("err_coverage_ppm"))
      case _ => ()
    }
    // the whole corpus (band 0 rung) is full keep and full coverage
    val last = rows.last
    assert(last.getAs[Long]("keep_frac_ppm") == 1000000L)
    assert(last.getAs[Long]("err_coverage_ppm") == 1000000L)
    // the operational claim: the top rung's error coverage strictly
    // exceeds its keep fraction (pruning low-EL2N docs keeps the
    // hard cases) — measured 416666 vs 180000 at sf0.001
    val top = rows.head
    assert(top.getAs[Long]("err_coverage_ppm")
      > top.getAs[Long]("keep_frac_ppm"),
      s"no separation: ${top.mkString(",")}")
  }

  test("q346 repetition census: ppm bounds, fail counts within docs, " +
      "docs partition the multi-token corpus") {
    val rows = TextQueries.q346.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("top_word_char_ppm", "top_bigram_char_ppm", "dup_word_ppm",
        "dup_bigram_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c = $v")
      }
      val docs = r.getAs[Long]("docs")
      Seq("f_top_word", "f_top_bigram", "f_dup_bigram").foreach { c =>
        assert(r.getAs[Long](c) <= docs, s"$c above docs")
      }
      // word-grain duplication dominates bigram-grain duplication on
      // any natural token stream (measured ~0.78e6 vs ~0.05e6)
      assert(r.getAs[Long]("dup_word_ppm")
        > r.getAs[Long]("dup_bigram_ppm"))
    }
    val multiTok = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")) >= 2)
      .count()
    assert(rows.map(_.getAs[Long]("docs")).sum == multiTok)
  }

  test("q348 char entropy: min <= mean <= max, fail nesting, " +
      "alphabet-bounded values") {
    val rows = TextQueries.q348.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Long]("min_h_mnat"),
        r.getAs[Long]("mean_h_mnat"), r.getAs[Long]("max_h_mnat"))
      assert(mn <= mean && mean <= mx, s"$mn / $mean / $mx")
      // H <= ln(|alphabet|); the corpus vocabulary spells with well
      // under 40 distinct characters -> 3689 mnat ceiling
      assert(mn >= 0L && mx <= 3689L)
      assert(r.getAs[Long]("f_hard") <= r.getAs[Long]("f_soft"))
      assert(r.getAs[Long]("f_soft") <= r.getAs[Long]("docs"))
    }
  }
}
