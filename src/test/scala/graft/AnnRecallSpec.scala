package graft

import graft.queries.VectorQueries

/** Retrieval-quality floors for the ANN paths: recall@3 of each
  * approximate method against the exact brute-force baseline (q32) —
  * the evidence the rows-only q43 (MLlib k-means IVF) can't get from
  * the SQL oracle: the approximation must actually FIND near
  * neighbors, not just return rows.
  *
  * Context for the floor values: the synthetic embeddings are
  * UNIFORMLY RANDOM — no cluster structure — which is the worst case
  * for any space-partitioning ANN (neighbors are spread across cells
  * almost independently of the partition). The measured recalls are
  * deterministic (fixed data + seeds), so the floors are tight
  * regression pins, not aspirations; on real clustered embeddings
  * all three paths do far better. Random-guess recall@3 here is
  * 3/49 ≈ 0.06. */
class AnnRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def topk(df: org.apache.spark.sql.DataFrame,
                   k: Int): Map[Long, Set[Long]] =
    df.filter(org.apache.spark.sql.functions.col("rnk") <= k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val exact = topk(VectorQueries.q32.run(spark, sf), 3)

  private def recallAt3(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.toSeq.map { case (q, ex) =>
      approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size)
        .getOrElse(0.0)
    }
    per.sum / per.size
  }

  test("IVF (deterministic quantizer, q38) recall@3 vs exact") {
    val r = recallAt3(topk(VectorQueries.q38.run(spark, sf), 3))
    info(f"q38 recall@3 = $r%.3f")
    assert(r >= 0.30, f"recall $r%.3f")
  }

  test("IVF (k-means quantizer, q43) recall@3 vs exact") {
    val r = recallAt3(topk(VectorQueries.q43.run(spark, sf), 3))
    info(f"q43 recall@3 = $r%.3f")
    // the learned quantizer beats the deterministic one (0.387 > 0.320)
    assert(r >= 0.35, f"recall $r%.3f")
  }

  test("LSH buckets (q33) recall@3 vs exact") {
    val r = recallAt3(topk(VectorQueries.q33.run(spark, sf), 3))
    info(f"q33 recall@3 = $r%.3f")
    // 4 hyperplane bits over a tiny random corpus: the coarse path —
    // barely above random here (0.093 vs 0.061), which is exactly why
    // q33's Scaladoc says bits must GROW with N; the floor pins the
    // deterministic value against regression
    assert(r >= 0.09, f"recall $r%.3f")
  }

  test("PQ/ADC (q197) recall@3 vs exact") {
    val r = recallAt3(topk(VectorQueries.q197.run(spark, sf), 3))
    info(f"q197 recall@3 = $r%.3f")
    // 8 subspaces × 16 codes over uniform-random 64-dim vectors is
    // severe compression (256 B → 4 B) on the ANN worst case; the
    // floor pins the measured deterministic 0.147 against regression
    // — 2.4× above random-guess (0.061)
    assert(r >= 0.14, f"recall $r%.3f")
  }

  test("IVF-PQ two-stage (q203) recall@3 vs exact") {
    val r = recallAt3(topk(VectorQueries.q203.run(spark, sf), 3))
    info(f"q203 recall@3 = $r%.3f")
    // measured 0.333: the exact re-rank of the 10-candidate ADC
    // shortlist more than DOUBLES raw ADC (q197, 0.147) and matches
    // the full-scan IVF (q38, 0.320) while touching only 2/16 cells
    // plus 4-byte codes — the two-stage recipe earning its keep even
    // on uniform-random data (the ANN worst case)
    assert(r >= 0.30, f"recall $r%.3f")
  }

  test("PQ Lloyd step (q202): reconstruction error strictly improves per subspace") {
    // the k-means descent property, measured not assumed: one exact
    // integer Lloyd step must cut total reconstruction error in EVERY
    // subspace (flooring the mean costs at most n micro-units² per
    // cell — noise against ~20% improvements)
    val rows = VectorQueries.q202.run(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val sub = r.getAs[Number]("sub").longValue
      val before = r.getAs[Long]("d2_before")
      val after = r.getAs[Long]("d2_after")
      assert(after < before, s"sub $sub: $before -> $after")
    }
  }

  test("nprobe frontier (q301): recall monotone nondecreasing, q203's " +
      "2-probe convention on the curve") {
    // candidate/hit sets nest across probe widths BY CONSTRUCTION —
    // this pins that the implementation preserves it (a reach-rank or
    // ladder-join bug would break nesting first), plus the floor at
    // nprobe=1: even one probed cell must beat random-guess recall.
    val rows = VectorQueries.q301.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"candidates not nested: $a vs $b")
      assert(a._3 <= b._3, s"hits not nested: $a vs $b")
      assert(a._4 <= b._4, s"recall not monotone: $a vs $b")
    }
    rows.foreach { case (p, _, _, rec) =>
      info(s"nprobe=$p recall_ppm=$rec")
    }
    assert(rows.head._4 > 100000,
      s"nprobe=1 recall ${rows.head._4} ppm at or below noise")
  }

  test("PQ drift monitor (q302): Lloyd step never raises any cell's " +
      "reconstruction error in aggregate") {
    // per-(sub, cid) census over the fresh slice: the re-assignment
    // after the update step is an argmin over a codebook containing
    // each vector's previous entry OR its floored-mean replacement —
    // totals per subspace must not increase (the q202 descent
    // property at monitor granularity), and every shift_ppm is a
    // valid fraction.
    val rows = VectorQueries.q302.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySub = rows.groupBy(_.getAs[Number]("sub").longValue)
    assert(bySub.keySet == (0L until 8L).toSet)
    bySub.foreach { case (sub, rs) =>
      val before = rs.map(_.getAs[Long]("d2_stored")).sum
      val after = rs.map(_.getAs[Long]("d2_new")).sum
      assert(after <= before, s"sub $sub: $before -> $after")
    }
    rows.foreach { r =>
      val ppm = r.getAs[Long]("shift_ppm")
      assert(ppm >= 0 && ppm <= 1000000)
      assert(r.getAs[Long]("n_shifted") <= r.getAs[Long]("n_members"))
    }
  }

  test("PQ assignment (q196): codebook seed vectors reconstruct exactly") {
    // each seed vector's subvectors ARE codebook entries, so its
    // reconstruction error must be 0 and its packed code must decode
    // back to a cid <= its own vec_id in every nibble (ties to lower)
    val rows = VectorQueries.q196.run(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L,
        s"seed ${r.getLong(0)} recon_d2 ${r.getLong(2)}")
      val code = r.getLong(1)
      (0 until 8).foreach { m =>
        val cid = (code >> (4 * m)) & 0xF
        assert(cid <= r.getLong(0), s"seed ${r.getLong(0)} sub $m cid $cid")
      }
    }
  }

  test("graph-ANN beam ladder (q344): visited/recall monotone in beam " +
      "width, visited bounded by construction") {
    // Beam searches at different widths are run INDEPENDENTLY (beam
    // sets don't nest by theory, unlike q301's probed cells), so the
    // monotone ladder is a measured deterministic fact of the
    // committed corpus+graph, pinned here against regression; the
    // visited bound 1 + M + B·M per query IS structural (2 expansion
    // rounds, degree ≤ M = 8).
    val rows = VectorQueries.q344.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("beam_width"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (b, nq, cand, hits, rec) =>
      info(s"beam=$b visited=$cand recall_ppm=$rec")
      assert(cand <= nq * (1 + 8 + b * 8),
        s"beam=$b visited $cand above the structural bound")
      assert(hits <= 10 * nq && rec <= 1000000L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"visited not monotone: $a vs $b")
      assert(a._5 <= b._5, s"recall not monotone: $a vs $b")
    }
    // floors: beam=1 must beat random guess (~visited/N ≈ 0.02 here);
    // measured 0.168 / 0.192 at sf0.001 — regression pins
    assert(rows.head._5 >= 160000, s"beam=1 recall ${rows.head._5}")
    assert(rows.last._5 >= 190000, s"beam=4 recall ${rows.last._5}")
  }

  test("efSearch budget ladder (q350): visited/recall monotone in " +
      "budget, gate overshoot bounded, horizon does not bind") {
    // The convergence-terminated variant (round-11 verdict item 4):
    // per-query expansion stops at visited-set fixpoint (beam stopped
    // improving) or at the visited budget E; six rounds is the
    // documented horizon. n_stopped = n_queries asserts the horizon
    // did NOT bind — every query genuinely reached its stop condition
    // — and max_visited ≤ E + B·M is the structural gate-overshoot
    // bound (one final expansion past the budget check, ≤ beam ×
    // degree new nodes).
    val rows = VectorQueries.q350.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("budget"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_ppm"), r.getAs[Long]("n_stopped"),
        r.getAs[Long]("max_visited")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(16L, 32L, 64L))
    rows.foreach { case (e, nq, cand, hits, rec, stopped, maxV) =>
      info(s"budget=$e visited=$cand recall_ppm=$rec " +
        s"stopped=$stopped/$nq max_visited=$maxV")
      assert(stopped == nq,
        s"budget=$e: ${nq - stopped} queries still expanding at the " +
          "round horizon — raise K or the claim is wrong")
      assert(maxV <= e + 4 * 8,
        s"budget=$e max_visited $maxV above the gate-overshoot bound")
      assert(hits <= 10 * nq && rec <= 1000000L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"visited not monotone in budget: $a vs $b")
      assert(a._5 <= b._5, s"recall not monotone in budget: $a vs $b")
    }
    // the budget ladder must buy recall over q344's fixed 2-round
    // beam=4 search (same graph, same queries): budget 64 explores
    // deeper than 2 rounds ever can
    assert(rows.last._5 >= 190000, s"budget=64 recall ${rows.last._5}")
  }

  test("Matryoshka ladder (q358): m=64 rung is exactly the reference; " +
      "recall monotone in prefix width") {
    // The m = 64 rung ranks by the same (d2, neighbor_id) key as the
    // reference set itself, so its recall is exactly 10^6 ppm and its
    // hit count exactly 10 per query — a structural identity, not a
    // measurement. Monotonicity across nested prefixes is empirical
    // (not guaranteed by construction) but holds on this corpus and
    // is the property the ladder exists to expose; a regression here
    // means the truncated distances stopped being prefix sums.
    val rows = VectorQueries.q358.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("m"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    val nq = rows.head._2
    assert(rows.forall(_._2 == nq) && nq >= 10)
    rows.foreach { case (m, _, hits, rec) =>
      info(s"m=$m hits=$hits/$nq*10 recall_ppm=$rec")
      assert(hits <= 10 * nq && rec <= 1000000L)
      assert(rec == 1000000L * hits / (10 * nq))
    }
    assert(rows.last._3 == 10 * nq && rows.last._4 == 1000000L,
      "m=64 must reproduce the reference exactly")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4, s"recall not monotone in m: $a vs $b")
    }
  }
}
