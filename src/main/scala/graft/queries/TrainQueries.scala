package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data curation queries (round 9): the learned/optimized side
  * of corpus curation that the heuristic gates (q85 Gopher, q30 lang-ID,
  * q168 funnel) feed — classifier-based quality filtering, mixture
  * reweighting, hard-negative mining, vocabulary/packing budgeting.
  *
  * House rules as everywhere in `graft.queries`: every arithmetic step
  * is exact int64 on a declared unit grid, divisions that can see a
  * negative numerator use the sign-safe floor form
  * `(a - pmod(a, b)) / b` (identical in Spark `div` and DuckDB `//`
  * because the corrected numerator is an exact multiple), and each
  * QueryDef carries the mirrored DuckDB oracle.
  */
object TrainQueries {

  /** Sign-safe floor division a/b (b > 0) as SQL text for the DuckDB
    * oracle: the double-% canonical non-negative mod makes the
    * numerator an exact multiple of b, where truncating and flooring
    * integer division agree. */
  private def fdSql(a: String, b: String): String =
    s"(($a) - ((($a) % ($b) + ($b)) % ($b))) // ($b)"

  /** Spark twin of [[fdSql]] — `pmod` is the same canonical mod, and
    * the division is the integral `div` (pure int64: `Column.divide`
    * promotes to double, whose 2^53 mantissa silently goes off by one
    * once the corrected numerator passes ~9·10¹⁵ — the hazard
    * Intervals.floorDiv documents). The b > 0 precondition is REAL:
    * Spark's `pmod(a, b)` adds b only when the truncated remainder is
    * negative — for b < 0 it returns the POSITIVE representative while
    * fdSql's double-% returns the negative one, so the two engines go
    * off by one whenever b < 0 and b ∤ a (caught live by the round-11
    * sf0.1 gate on q339, whose determinant first goes negative at that
    * SF). Callers with sign-varying divisors must normalize: fold
    * sign(b) into the numerator and pass |b| (the q339 form). */
  private def fdCol(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  // ---------------------------------------------------------------------
  // q303 — quality-classifier TRAINING as a deterministic integer query
  // ---------------------------------------------------------------------

  /** Fixed featurizer for the classifier family: near-zero-centered
    * integer features on declared grids (centering constants are part
    * of the spec, like Buckets' cut points — NOT data-derived, so the
    * featurizer is a pure per-row projection at any scale).
    *   x0 bias=10; x1 = n_tokens−50; x2 = centi-mean-token-len−550;
    *   x3 = 10·stopword_count−30.
    */
  private val featSql =
    """feat AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
      |    CAST(10 AS BIGINT) AS x0,
      |    CAST(len(string_split(text, ' ')) - 50 AS BIGINT) AS x1,
      |    CAST((100 * n_chars) // len(string_split(text, ' ')) - 550
      |      AS BIGINT) AS x2,
      |    CAST(10 * len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'and'))) - 30 AS BIGINT) AS x3
      |  FROM documents)""".stripMargin

  /** One unrolled GD step of the q303 chain (e_i error frame + w_i
    * weight row) — shared by q303's census and the q317/q318
    * consumers of the trained weights. */
  private def gdStepSql(i: Int): String = {
    val z = "f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3"
    val pred = s"LEAST(1000000, GREATEST(0, ($z + 2000000) // 4))"
    def upd(j: Int) = // CAST: uncast DuckDB SUM arithmetic is HUGEINT
      s"CAST(MAX(w.w$j) - (${fdSql(s"SUM(err*x$j)", "MAX(n.n)*1000")}) AS BIGINT)"
    s""",
    |e$i AS (
    |  SELECT f.doc_id, f.y, f.x0, f.x1, f.x2, f.x3,
    |    $pred - f.y*1000000 AS err
    |  FROM feat f CROSS JOIN w${i - 1} w),
    |w$i AS (
    |  SELECT ${upd(0)} AS w0, ${upd(1)} AS w1,
    |    ${upd(2)} AS w2, ${upd(3)} AS w3
    |  FROM e$i, w${i - 1} w, n)""".stripMargin
  }

  /** The full q303 training prefix: featurized corpus, count, zero
    * init, and the three unrolled GD steps (CTEs feat/n/w0..w3) —
    * the oracle-side twin of QualityClassifier.trainCensus. */
  private val gdPrefixSql =
    s"""WITH $featSql,
    |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat),
    |w0 AS (SELECT CAST(0 AS BIGINT) w0, CAST(0 AS BIGINT) w1,
    |  CAST(0 AS BIGINT) w2, CAST(0 AS BIGINT) w3)""".stripMargin +
      (1 to 3).map(gdStepSql).mkString

  /** q303 — QUALITY-CLASSIFIER TRAINING, exact-integer full-batch
    * gradient descent: the learned document filter of GPT-3's pipeline
    * (Brown et al. 2020 App. A: a linear classifier over document
    * features scores every candidate page) and CCNet (Wenzek et al.
    * 2020), trained HERE as a deterministic query — the q43b/q202
    * treatment rotated onto supervised learning. Model: linear scorer
    * with the HARD-SIGMOID link σ̂(t) = clip(t/4 + 1/2, 0, 1)
    * (Courbariaux et al. 2015's piecewise-linear sigmoid), which makes
    * every quantity RATIONAL: three unrolled full-batch GD steps on the
    * ppm weight grid,
    *   w_j ← w_j − floor(Σ_i err_i·x_ij / (N·1000)),
    *   err_i = σ̂_ppm(Σ_j w_j·x_ij) − 10⁶·y_i,
    * with the sign-safe floor division (pmod form) wherever a numerator
    * can be negative. The per-step census reports the weight vector,
    * positive-prediction count, and training accuracy (ppm). On this
    * synthetic corpus the en/non-en label carries almost no feature
    * signal (shared 31-token vocab), so the learned weights converge to
    * the class prior — the gate pins the training ARITHMETIC (identical
    * int64 sequence in both engines), not model skill. σ̂'s clip needs
    * no sign-safe care: the numerator z+2·10⁶ is positive throughout
    * the active region, and outside it trunc-vs-floor differences are
    * erased by the GREATEST(0, ·) clamp.
    *
    * Scale: each step is one broadcast of the 1×4 weight row against a
    * per-row projection + one map-side-combinable 4-column sum — 3
    * linear passes total, no shuffle beyond the scalar agg; exactly how
    * a full-batch linear probe trains on 100 TB (the reference's
    * quality scorer is per-record arithmetic,
    * processing/utils/data_quality.py:560, scored in one pass). */
  val q303 = QueryDef(
    "q303_quality_classifier_gd", {
      def accSql(i: Int): String = {
        val z = "f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3"
        val hit = s"CASE WHEN ($z) > 0 THEN 1 ELSE 0 END"
        s""",
        |a$i AS (
        |  SELECT CAST($i AS BIGINT) AS step,
        |    MAX(w.w0) AS w0, MAX(w.w1) AS w1,
        |    MAX(w.w2) AS w2, MAX(w.w3) AS w3,
        |    CAST(SUM($hit) AS BIGINT) AS n_pred_pos,
        |    CAST(1000000 * SUM(CASE WHEN ($hit) = f.y THEN 1 ELSE 0 END)
        |      // MAX(n.n) AS BIGINT) AS acc_ppm
        |  FROM feat f CROSS JOIN w$i w CROSS JOIN n)""".stripMargin
      }
      gdPrefixSql +
        (1 to 3).map(accSql).mkString +
        """
      |SELECT * FROM a1 UNION ALL SELECT * FROM a2
      |UNION ALL SELECT * FROM a3 ORDER BY step""".stripMargin
    }) { (s, d) =>
    // The training arithmetic lives in graft.ml.QualityClassifier
    // (the curation lifecycle's learned gate shares it); this QueryDef
    // is the oracle gate over that shared implementation.
    graft.ml.QualityClassifier.trainCensus(
      graft.ml.QualityClassifier.featurize(Tables.documents(s, d)))
  }

  // ---------------------------------------------------------------------
  // q304 — DoReMi-lite domain mixture reweighting (iterative, exact)
  // ---------------------------------------------------------------------

  /** q304 — DOMAIN MIXTURE REWEIGHTING, DoReMi-shaped (Xie et al. 2023):
    * which source domains should be UP-sampled when building the
    * training mixture? DoReMi's loop — score each domain's excess loss
    * under the current mixture, multiplicatively upweight the
    * worst-served domains, renormalize, repeat — run here with exact
    * unigram LMs standing in for the proxy model, entirely on integer
    * grids. Per round r (3 unrolled rounds, uniform start):
    *   p_d(t)   = per-domain unigram prob, ppm (floor, clamped ≥ 1);
    *   p_mix(t) = Σ_d α_d·p_d(t) / 10⁶, ppm (the α-weighted mixture);
    *   excess_d = clamp₀ floor( Σ_t c_dt·[mnat p_d(t) − mnat p_mix(t)]
    *              / n_d )  — per-token KL(d ‖ mix) in milli-nats, the
    *              "how badly does the current mixture serve d" score
    *              (DoReMi's excess loss with the unigram LM as proxy);
    *   α_d     ← renorm( α_d·(10⁶ + η·excess_d) / 10⁶ ),  η = 10⁴.
    * Both logs ride [[graft.functions.LangModel.mnat]]'s milli-nat
    * quantizer contract; the one signed division (the KL sum CAN dip
    * negative after flooring) is the sign-safe pmod form; the
    * renormalized α are floored ppm (Σ ≤ 10⁶ by at most |D|). Output:
    * (round, source, alpha_ppm, excess_mnat) — 3·|D| rows.
    *
    * Scale: the only growing intermediate is the (domain, token) count
    * table — the same |V|-bounded frame as q130's LM, count-min
    * compressible per q101's argument; each round is one broadcast of
    * the |D|-row α vector, one token-keyed agg (map-side combinable),
    * one domain-keyed agg. Rounds are fixed (3), not data-dependent.
    * The census and per-round α ride localCheckpoint + pin (the
    * PageRank/q307 lineage discipline): α is read twice per round, so
    * without truncation round r's plan nests every earlier round. */
  val q304 = QueryDef(
    "q304_mixture_reweight", {
      import graft.functions.LangModel.{mnatSql => mn}
      def rnd(i: Int): String = s""",
      |pm$i AS (
      |  SELECT pd.t,
      |    GREATEST(1, CAST(SUM(a.a * pd.p_ppm) // 1000000 AS BIGINT))
      |      AS pm_ppm
      |  FROM pd JOIN a${i - 1} a ON pd.d = a.d GROUP BY 1),
      |ex$i AS (
      |  SELECT pd.d,
      |    CAST(GREATEST(0, ${fdSql(
        s"SUM(pd.c * (${mn("pd.p_ppm")} - ${mn("pm.pm_ppm")}))",
        "MAX(nd.n)")}) AS BIGINT) AS e
      |  FROM pd JOIN pm$i pm ON pd.t = pm.t JOIN nd ON nd.d = pd.d
      |  GROUP BY 1),
      |up$i AS (
      |  SELECT a.d,
      |    CAST(a.a * (1000000 + 10000 * e.e) // 1000000 AS BIGINT)
      |      AS a_raw, e.e
      |  FROM a${i - 1} a JOIN ex$i e ON a.d = e.d),
      |a$i AS (
      |  SELECT d, CAST(a_raw * 1000000 //
      |    (SELECT SUM(a_raw) FROM up$i) AS BIGINT) AS a, e
      |  FROM up$i)""".stripMargin
      """WITH tok AS (
      |  SELECT source AS d, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |dt AS (SELECT d, t, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |nd AS (SELECT d, CAST(SUM(c) AS BIGINT) AS n FROM dt GROUP BY 1),
      |pd AS (
      |  SELECT dt.d, dt.t, dt.c,
      |    GREATEST(1, 1000000 * dt.c // nd.n) AS p_ppm
      |  FROM dt JOIN nd ON dt.d = nd.d),
      |a0 AS (SELECT d,
      |  CAST(1000000 // (SELECT COUNT(*) FROM nd) AS BIGINT) AS a
      |  FROM nd)""".stripMargin +
        (1 to 3).map(rnd).mkString + """
      |SELECT r, d AS source, a AS alpha_ppm, e AS excess_mnat FROM (
      |  SELECT CAST(1 AS BIGINT) AS r, d, a, e FROM a1
      |  UNION ALL SELECT 2, d, a, e FROM a2
      |  UNION ALL SELECT 3, d, a, e FROM a3)
      |ORDER BY r, source""".stripMargin
    }) { (s, d) =>
    // The reweighting arithmetic lives in graft.ml.Mixture (the
    // curation lifecycle's sampling weights share it); this QueryDef
    // is the oracle gate over that shared implementation.
    graft.ml.Mixture.alphaRounds(Tables.documents(s, d))
  }

  // ---------------------------------------------------------------------
  // q306 — user-level contribution bounding census (DP preprocessing)
  // ---------------------------------------------------------------------

  /** q306 — CONTRIBUTION BOUNDING census, the user-level-DP
    * preprocessing step the privacy ladder (q206 k-anon → q227 l-div →
    * q258 t-close) stops short of: before any DP mechanism can add
    * calibrated noise, each user's contribution must be bounded —
    * events capped at k per user, value clipped at τ per user — and
    * the UTILITY COST of each bound is what the operator tunes (Amin
    * et al. 2019, "Bounding user contributions in differentially
    * private estimation"; the clip-then-noise recipe of McMahan et al.
    * 2018). For the declared cap ladder k ∈ {8, 32, 128} with value
    * clip τ = 500·k cents: users clipped, events dropped (count-query
    * sensitivity bias, ppm of all events), clipped value mass, and the
    * value-sum bias in ppm — the bias–sensitivity trade-off curve.
    * Value cents ride the standard floor(100·v + 1/2) snap; every
    * aggregate is an exact int64 sum (values are positive cents, no
    * sign-safe care needed).
    *
    * Scale: one per-user keyed agg (map-side combinable) + a 3-row
    * broadcast ladder cross join — the census never materializes
    * per-event state, so it runs at any corpus size; the per-user
    * frame is the same cardinality every user-keyed gold table
    * already carries. */
  val q306 = QueryDef(
    "q306_contribution_bounding",
    """WITH pu AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
      |    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS val_cents
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_ev) AS BIGINT) AS n,
      |  CAST(SUM(val_cents) AS BIGINT) AS v FROM pu),
      |k AS (SELECT CAST(unnest([8, 32, 128]) AS BIGINT) AS cap)
      |SELECT k.cap,
      |  CAST(SUM(CASE WHEN pu.n_ev > k.cap THEN 1 ELSE 0 END)
      |    AS BIGINT) AS clipped_users,
      |  CAST(SUM(GREATEST(0, pu.n_ev - k.cap)) AS BIGINT)
      |    AS dropped_events,
      |  CAST(SUM(GREATEST(0, pu.n_ev - k.cap)) * 1000000 // MAX(tot.n)
      |    AS BIGINT) AS dropped_ppm,
      |  CAST(SUM(LEAST(pu.val_cents, k.cap * 500)) AS BIGINT)
      |    AS clipped_val_cents,
      |  CAST((MAX(tot.v) - SUM(LEAST(pu.val_cents, k.cap * 500)))
      |    * 1000000 // MAX(tot.v) AS BIGINT) AS val_bias_ppm
      |FROM k CROSS JOIN pu CROSS JOIN tot
      |GROUP BY k.cap ORDER BY k.cap""".stripMargin) { (s, d) =>
    val pu = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("val_cents"))
    val tot = pu.agg(sum(col("n_ev")).as("n"), sum(col("val_cents")).as("v"))
    val k = s.range(1).select(
      explode(array(lit(8L), lit(32L), lit(128L))).as("cap"))
    pu.crossJoin(broadcast(k)).crossJoin(broadcast(tot))
      .groupBy(col("cap"))
      .agg(
        sum(when(col("n_ev") > col("cap"), 1L).otherwise(0L))
          .as("clipped_users"),
        sum(greatest(lit(0L), col("n_ev") - col("cap")))
          .as("dropped_events"),
        expr("sum(greatest(0L, n_ev - cap)) * 1000000 div max(n)")
          .as("dropped_ppm"),
        sum(least(col("val_cents"), col("cap") * 500L))
          .as("clipped_val_cents"),
        expr("(max(v) - sum(least(val_cents, cap * 500))) * 1000000" +
          " div max(v)").as("val_bias_ppm"))
      .orderBy("cap")
  }

  // ---------------------------------------------------------------------
  // q308 — weight-of-evidence / information-value feature screen
  // ---------------------------------------------------------------------

  /** q308 — WEIGHT OF EVIDENCE + INFORMATION VALUE, the scorecard-era
    * feature screen (Siddiqi 2006) that still gates which raw columns
    * earn a slot in a training table: per feature bin b,
    *   WOE_b = ln(pos_b/pos_tot) − ln(neg_b/neg_tot)
    * and the bin's IV contribution (pos_share − neg_share)·WOE_b —
    * summed over bins, the feature's separation power (<0.02
    * worthless, >0.3 strong). Binned here on order priority against
    * the finished-status target. Every log rides
    * [[graft.functions.LangModel.mnat]]'s milli-nat quantizer, shares
    * are exact ppm, and the IV contribution lands on the micro-nat
    * grid via the sign-safe floor division (share differences and WOE
    * are both signed). Complements q212 (out-of-fold target encoding
    * ENCODES the category; this SCREENS it) and q295 (Cramér's V is
    * the symmetric association; IV is the target-directed one).
    * Precondition (documented, as for the NB classifier): every bin
    * holds ≥1 positive and ≥1 negative — mnat(0) is undefined; on
    * degenerate slices bin coarser first.
    *
    * Scale: one keyed census over orders (map-side combinable) into a
    * |bins|-row frame, one broadcast one-row total — the same shape at
    * any corpus size. */
  val q308 = QueryDef(
    "q308_woe_iv", {
      import graft.functions.LangModel.{mnatSql => mn}
      val woe = s"${mn("b.pos")} - ${mn("t.pt")} - ${mn("b.neg")} + ${mn("t.nt")}"
      val diff = "1000000 * b.pos // t.pt - 1000000 * b.neg // t.nt"
      s"""WITH b AS (
      |  SELECT o_orderpriority AS pri,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS neg
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(pos) AS BIGINT) AS pt,
      |  CAST(SUM(neg) AS BIGINT) AS nt FROM b)
      |SELECT b.pri, b.pos, b.neg,
      |  CAST(1000000 * b.pos // t.pt AS BIGINT) AS pos_ppm,
      |  CAST(1000000 * b.neg // t.nt AS BIGINT) AS neg_ppm,
      |  CAST($woe AS BIGINT) AS woe_mnat,
      |  CAST(${fdSql(s"($diff) * ($woe)", "1000")} AS BIGINT)
      |    AS iv_contrib_unat
      |FROM b CROSS JOIN t ORDER BY b.pri""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    val b = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("pos"),
        sum(when(col("o_orderstatus") === "F", 0L).otherwise(1L)).as("neg"))
    val t = b.agg(sum(col("pos")).as("pt"), sum(col("neg")).as("nt"))
    val woe = mnat(col("pos")) - mnat(col("pt")) -
      mnat(col("neg")) + mnat(col("nt"))
    val posPpm = expr("1000000L * pos div pt")
    val negPpm = expr("1000000L * neg div nt")
    b.crossJoin(broadcast(t))
      .select(col("pri"), col("pos"), col("neg"),
        posPpm.as("pos_ppm"), negPpm.as("neg_ppm"),
        woe.as("woe_mnat"),
        fdCol((posPpm - negPpm) * woe, lit(1000L)).as("iv_contrib_unat"))
      .orderBy("pri")
  }

  // ---------------------------------------------------------------------
  // q312 — effective sample size under temperature-scaled sampling
  // ---------------------------------------------------------------------

  /** q312 — EFFECTIVE SAMPLE SIZE of a weighted sampling scheme (Kong
    * 1992's ESS = (Σw)²/Σw², THE importance-sampling health metric):
    * when documents are sampled ∝ length^T (length-proportional
    * sampling and its sharpened variants — the same temperature knob
    * as q102's source mixing, applied at the DOCUMENT level), how much
    * of the corpus effectively survives? Per temperature T ∈ {1,2,3}:
    * w = floor(n_chars^T / 10^{3(T−1)}) (the downscale keeps every
    * sum in int64 — exact for corpora ≤ ~1.6·10⁷ docs, the documented
    * headroom; beyond that the same query runs on DECIMAL(38)/HUGEINT
    * sums), ESS = (Σw)² / Σw², and ess_ppm = share of n. Sharper
    * temperature → heavier concentration on long documents → ESS
    * collapse: the curve quantifies the diversity cost BEFORE a
    * resample is materialized (q139's weighted sampler consumes
    * exactly these weights).
    *
    * Scale: one map-side-combinable 3-accumulator agg per temperature
    * over a per-row projection — three scans, no shuffle beyond the
    * scalar aggs, any corpus size. */
  val q312 = QueryDef(
    "q312_sampling_ess",
    """WITH w AS (
      |  SELECT t.t,
      |    CAST(SUM(POW_W) AS BIGINT) AS sw,
      |    CAST(SUM(POW_W * POW_W) AS BIGINT) AS sw2,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents CROSS JOIN
      |    (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS t) t
      |  GROUP BY 1)
      |SELECT t, n, sw, sw2,
      |  CAST((sw * sw) // sw2 AS BIGINT) AS ess,
      |  CAST(1000000 * ((sw * sw) // sw2) // n AS BIGINT) AS ess_ppm
      |FROM w ORDER BY t""".stripMargin
      .replace("POW_W", // outer parens: POW_W*POW_W must be (a//b)*(a//b)
        "((n_chars * CASE WHEN t.t >= 2 THEN n_chars ELSE 1 END * " +
          "CASE WHEN t.t = 3 THEN n_chars ELSE 1 END) // " +
          "CASE t.t WHEN 1 THEN 1 WHEN 2 THEN 1000 ELSE 1000000 END)")) {
    (s, d) =>
    val t = s.range(1).select(
      explode(array(lit(1L), lit(2L), lit(3L))).as("t"))
    val powW = expr(
      "(n_chars * CASE WHEN t >= 2 THEN n_chars ELSE 1L END * " +
        "CASE WHEN t = 3 THEN n_chars ELSE 1L END) div " +
        "CASE t WHEN 1 THEN 1L WHEN 2 THEN 1000L ELSE 1000000L END")
    Tables.documents(s, d).select(col("n_chars")).crossJoin(broadcast(t))
      .select(col("t"), powW.as("w"))
      .groupBy(col("t"))
      .agg(sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sw2"),
        count(lit(1)).as("n"))
      .select(col("t"), col("n"), col("sw"), col("sw2"),
        expr("(sw * sw) div sw2").as("ess"),
        expr("1000000L * ((sw * sw) div sw2) div n").as("ess_ppm"))
      .orderBy("t")
  }

  // ---------------------------------------------------------------------
  // q313 — shelf-packed sequence batching census (no-split packing)
  // ---------------------------------------------------------------------

  /** q313 — SHELF PACKING census for training-sequence batching (the
    * packing question of Krell et al. 2021 under the NO-SPLIT
    * discipline): q98 packs by concat-then-chunk, which splits
    * documents at every chunk edge; attention-friendly batching
    * instead bins WHOLE sequences. The shelf scheme — round each
    * sequence up to its power-of-two size class, pack ⌊C/class⌋
    * docs per bin of capacity C = 128 — is the fully-parallel
    * deterministic variant (first-fit-decreasing is inherently
    * sequential; shelves need only a per-class census):
    * bins_class = ⌈n_docs/⌊C/class⌋⌉, waste = bins·C − Σ tokens.
    * Output per class: docs, docs/bin, bins, allocated vs used
    * tokens, waste ppm — against which the q98 splitting packer's
    * zero waste is the trade-off baseline (no padding vs broken
    * attention spans). Whitespace tokens (the house convention);
    * class ladder {16,32,64,128} covers the corpus (token counts
    * 10–100); longer docs are q98-chunked upstream by contract.
    *
    * Scale: one per-doc projection + one |classes|-row keyed census —
    * no window, no join; the bin count is arithmetic on the census,
    * so the plan is a single map-side-combinable agg at any corpus
    * size. */
  val q313 = QueryDef(
    "q313_shelf_packing",
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents),
      |cl AS (
      |  SELECT nt,
      |    CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
      |      WHEN nt <= 64 THEN 64 ELSE 128 END AS cls
      |  FROM t WHERE nt <= 128),
      |c AS (
      |  SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(nt) AS BIGINT) AS used_tokens
      |  FROM cl GROUP BY 1)
      |SELECT cls, n_docs,
      |  CAST(128 // cls AS BIGINT) AS docs_per_bin,
      |  CAST((n_docs + (128 // cls) - 1) // (128 // cls) AS BIGINT)
      |    AS bins,
      |  CAST(128 * ((n_docs + (128 // cls) - 1) // (128 // cls))
      |    AS BIGINT) AS alloc_tokens,
      |  used_tokens,
      |  CAST(1000000 * (128 * ((n_docs + (128 // cls) - 1)
      |      // (128 // cls)) - used_tokens)
      |    // (128 * ((n_docs + (128 // cls) - 1) // (128 // cls)))
      |    AS BIGINT) AS waste_ppm
      |FROM c ORDER BY cls""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .filter(col("nt") <= 128)
      .withColumn("cls",
        when(col("nt") <= 16, 16L).when(col("nt") <= 32, 32L)
          .when(col("nt") <= 64, 64L).otherwise(128L))
    t.groupBy(col("cls"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("used_tokens"))
      .withColumn("docs_per_bin", expr("128L div cls"))
      .withColumn("bins",
        expr("(n_docs + docs_per_bin - 1) div docs_per_bin"))
      .withColumn("alloc_tokens", col("bins") * 128L)
      .withColumn("waste_ppm",
        expr("1000000L * (alloc_tokens - used_tokens) div alloc_tokens"))
      .select(col("cls"), col("n_docs"), col("docs_per_bin"),
        col("bins"), col("alloc_tokens"), col("used_tokens"),
        col("waste_ppm"))
      .orderBy("cls")
  }

  // ---------------------------------------------------------------------
  // q313b — shelf-packing ASSIGNMENT (doc → class, bin, slot)
  // ---------------------------------------------------------------------

  /** q313b — the shelf-packing ASSIGNMENT the q313 census prices
    * (Krell et al. 2021's packing, NO-SPLIT discipline): emit the
    * deterministic doc → (class, bin_id, slot) map a batch builder
    * consumes. Same class ladder as q313 (round up to the power-of-two
    * class, ⌊128/class⌋ docs per bin); within a class, docs are laid
    * out in CONTENT-HASH order (md5 — placement is a pure function of
    * the corpus, independent of scan order, the q22 content-identity
    * convention) with doc_id breaking exact-duplicate ties, and
    *   bin_id = ⌊rank/docs_per_bin⌋,  slot = rank mod docs_per_bin
    * (rank 0-based). q98 is the splitting packer (zero waste, broken
    * attention spans), q313 the whole-sequence price census, this the
    * materialized placement — the three together are the packing
    * story.
    *
    * Scale: a window partitioned by FOUR classes is the same
    * scale-killer as a partition-less one (each class's whole corpus
    * sorts in one task), so the within-class rank is
    * [[graft.functions.Ranks.rowNumberPerKey]] — range-bucketed on a
    * 60-bit numeric prefix of the hash (uniform by construction, so
    * the buckets balance), counts prefix-scanned per key on the
    * bounded (|classes|·buckets)-row census, offsets broadcast-joined
    * back: one hash shuffle, parallel sorts, no data-sized single
    * task. Ordering by (hash-prefix, hash, doc_id) equals ordering by
    * (hash, doc_id) — the prefix is a monotone function of the hash's
    * first 15 hex chars. */
  val q313b = QueryDef(
    "q313b_shelf_assignment",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
      |      AS nt,
      |    md5(text) AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, nt, h,
      |    CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
      |      WHEN nt <= 64 THEN 64 ELSE 128 END AS cls
      |  FROM t WHERE nt <= 128),
      |r AS (
      |  SELECT doc_id, nt, cls,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cls ORDER BY h, doc_id)
      |      - 1 AS BIGINT) AS rn
      |  FROM c)
      |SELECT doc_id, CAST(cls AS BIGINT) AS cls, nt,
      |  CAST(rn // (128 // cls) AS BIGINT) AS bin_id,
      |  CAST(rn % (128 // cls) AS BIGINT) AS slot
      |FROM r ORDER BY cls, bin_id, slot""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        md5(col("text")).as("h"))
      .filter(col("nt") <= 128)
      .withColumn("cls",
        when(col("nt") <= 16, 16L).when(col("nt") <= 32, 32L)
          .when(col("nt") <= 64, 64L).otherwise(128L))
      .withColumn("hk",
        conv(substring(col("h"), 1, 15), 16, 10).cast("long"))
    graft.functions.Ranks.rowNumberPerKey(t, col("cls"), col("hk"),
        Seq(col("h"), col("doc_id")), "rn1")
      .withColumn("rn", col("rn1") - 1L)
      .select(col("doc_id"), col("cls"), col("nt"),
        expr("rn div (128L div cls)").as("bin_id"),
        expr("rn % (128L div cls)").as("slot"))
      .orderBy("cls", "bin_id", "slot")
  }

  // ---------------------------------------------------------------------
  // q317 — dataset cartography (training-dynamics map)
  // ---------------------------------------------------------------------

  /** q317 — DATASET CARTOGRAPHY (Swayamdipta et al. 2020): map every
    * document by its TRAINING DYNAMICS under the q303 GD run — mean
    * true-class confidence μ across the three checkpoints and its
    * variability — the easy-to-learn / hard-to-learn / ambiguous
    * triage that decides what to keep, relabel, or inspect. Per doc,
    * conf_i = σ̂_ppm(z_i) for y=1 and 10⁶−σ̂ for y=0 under checkpoint
    * w_i; μ_ppm = ⌊Σconf/3⌋ and the EXACT scaled variance
    * var9 = 3·Σconf² − (Σconf)² (= 9·Var, integer ≥ 0 — no floored
    * mean enters the spread, the q310 moment discipline). Output: the
    * (μ decile band, var order-of-magnitude band) census with doc and
    * positive-label counts — confident+stable bands are keep-lists,
    * high-var bands the ambiguous frontier, low-μ+stable bands the
    * likely label errors (q318's confident-joint view of the same
    * run).
    *
    * Scale: the checkpoint weights are a 3-row broadcast; conf is a
    * per-(doc, step) projection (3n rows, map-side), the per-doc agg
    * and the band census are keyed aggs — nothing beyond the q303
    * training passes themselves. */
  val q317 = QueryDef(
    "q317_dataset_cartography", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      gdPrefixSql + s""",
      |ws AS (
      |  SELECT CAST(1 AS BIGINT) AS step, w0, w1, w2, w3 FROM w1
      |  UNION ALL SELECT 2, w0, w1, w2, w3 FROM w2
      |  UNION ALL SELECT 3, w0, w1, w2, w3 FROM w3),
      |cf AS (
      |  SELECT f.doc_id, f.y,
      |    CASE WHEN f.y = 1 THEN ($pred)
      |      ELSE 1000000 - ($pred) END AS conf
      |  FROM feat f CROSS JOIN ws w),
      |pd AS (
      |  SELECT doc_id, MAX(y) AS y, CAST(SUM(conf) AS BIGINT) AS sc,
      |    CAST(SUM(conf * conf) AS BIGINT) AS m2
      |  FROM cf GROUP BY 1),
      |bd AS (
      |  SELECT y, sc // 3 AS mu_ppm,
      |    CAST(3 * m2 - sc * sc AS BIGINT) AS var9
      |  FROM pd)
      |SELECT CAST(mu_ppm // 100000 AS BIGINT) AS mu_band,
      |  CAST(CASE WHEN var9 >= 1000000000000 THEN 6
      |    WHEN var9 >= 10000000000 THEN 5
      |    WHEN var9 >= 100000000 THEN 4
      |    WHEN var9 >= 1000000 THEN 3
      |    WHEN var9 >= 10000 THEN 2
      |    WHEN var9 >= 100 THEN 1 ELSE 0 END AS BIGINT) AS var_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(y) AS BIGINT) AS n_label_pos
      |FROM bd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val census = Checkpoints.pin(
      QualityClassifier.trainCensus(feat).localCheckpoint())
    val ws = census.select(col("step"), col("w0"), col("w1"),
      col("w2"), col("w3"))
    val pred = expr("least(1000000L, greatest(0L, " +
      "(x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000L) div 4))")
    val cf = feat.crossJoin(broadcast(ws))
      .withColumn("conf",
        when(col("y") === 1L, pred).otherwise(lit(1000000L) - pred))
    cf.groupBy(col("doc_id"))
      .agg(max(col("y")).as("y"), sum(col("conf")).as("sc"),
        sum(col("conf") * col("conf")).as("m2"))
      .select(col("y"), expr("sc div 3").as("mu_ppm"),
        expr("3L * m2 - sc * sc").as("var9"))
      .groupBy(expr("mu_ppm div 100000").as("mu_band"),
        expr("""CASE WHEN var9 >= 1000000000000 THEN 6L
          | WHEN var9 >= 10000000000 THEN 5L
          | WHEN var9 >= 100000000 THEN 4L
          | WHEN var9 >= 1000000 THEN 3L
          | WHEN var9 >= 10000 THEN 2L
          | WHEN var9 >= 100 THEN 1L ELSE 0L END""".stripMargin)
          .as("var_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_label_pos"))
      .orderBy("mu_band", "var_band")
  }

  // ---------------------------------------------------------------------
  // q318 — confident-learning label-noise census
  // ---------------------------------------------------------------------

  /** q318 — CONFIDENT-LEARNING label-noise census (Northcutt, Jiang &
    * Chuang 2021, the Cleanlab estimator): estimate which labels the
    * corpus itself contradicts, using q303's trained scorer as the
    * out-of-the-box probe. Per-class self-confidence thresholds
    * t_j = ⌊mean_{i: y_i=j} p̂_j(i)⌋ (p̂₁ = σ̂, p̂₀ = 10⁶−σ̂ under the
    * final weights w3); a document joins the CONFIDENT JOINT at
    * (y, ĵ) when p̂_ĵ ≥ t_ĵ — ties over both thresholds resolve to
    * the larger margin (margin ties → class 1, stated), neither
    * threshold met → excluded (ĵ = −1). Off-diagonal mass is the
    * estimated label-noise rate; on this synthetic corpus the label
    * (lang = en) is nearly feature-free, so the census documents an
    * honest high-noise reading rather than a planted clean one.
    *
    * Scale: scoring is a per-row projection under a 1-row broadcast;
    * the thresholds are one scalar agg; the census is a 5-row keyed
    * agg — three linear passes beyond training itself. */
  val q318 = QueryDef(
    "q318_confident_learning", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      gdPrefixSql + s""",
      |sc AS (
      |  SELECT f.doc_id, f.y, $pred AS p
      |  FROM feat f CROSS JOIN w3 w),
      |th AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN y = 1 THEN p ELSE 0 END) //
      |      GREATEST(1, SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END))
      |      AS BIGINT) AS t1,
      |    CAST(SUM(CASE WHEN y = 0 THEN 1000000 - p ELSE 0 END) //
      |      GREATEST(1, SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END))
      |      AS BIGINT) AS t0
      |  FROM sc),
      |cj AS (
      |  SELECT s.y,
      |    CASE WHEN s.p >= t.t1 AND 1000000 - s.p >= t.t0 THEN
      |        CASE WHEN s.p - t.t1 >= (1000000 - s.p) - t.t0
      |          THEN 1 ELSE 0 END
      |      WHEN s.p >= t.t1 THEN 1
      |      WHEN 1000000 - s.p >= t.t0 THEN 0
      |      ELSE -1 END AS yhat
      |  FROM sc s CROSS JOIN th t)
      |SELECT CAST(c.y AS BIGINT) AS y,
      |  CAST(c.yhat AS BIGINT) AS yhat_conf,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(1000000 * COUNT(*) // MAX(n.n) AS BIGINT) AS share_ppm
      |FROM cj c CROSS JOIN n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(
      Checkpoints.pin(
        QualityClassifier.trainCensus(feat).localCheckpoint()))
    val nRow = feat.agg(count(lit(1)).as("n"))
    val sc = feat.crossJoin(broadcast(w3))
      .withColumn("p", expr("least(1000000L, greatest(0L, " +
        "(x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000L) div 4))"))
    val th = sc.agg(
      expr("""sum(CASE WHEN y = 1 THEN p ELSE 0L END) div
        | greatest(1L, sum(CASE WHEN y = 1 THEN 1L ELSE 0L END))"""
        .stripMargin).as("t1"),
      expr("""sum(CASE WHEN y = 0 THEN 1000000L - p ELSE 0L END) div
        | greatest(1L, sum(CASE WHEN y = 0 THEN 1L ELSE 0L END))"""
        .stripMargin).as("t0"))
    sc.crossJoin(broadcast(th))
      .withColumn("yhat_conf", expr(
        """CASE WHEN p >= t1 AND 1000000L - p >= t0 THEN
          |  CASE WHEN p - t1 >= (1000000L - p) - t0 THEN 1L ELSE 0L END
          | WHEN p >= t1 THEN 1L
          | WHEN 1000000L - p >= t0 THEN 0L
          | ELSE -1L END""".stripMargin))
      .crossJoin(broadcast(nRow))
      .groupBy(col("y"), col("yhat_conf"))
      .agg(count(lit(1)).as("n_docs"),
        expr("1000000L * count(1) div max(n)").as("share_ppm"))
      .orderBy("y", "yhat_conf")
  }

  // ---------------------------------------------------------------------
  // q319 — TracIn self-influence census (memorization triage)
  // ---------------------------------------------------------------------

  /** q319 — SELF-INFLUENCE census, TracIn-style (Pruthi et al. 2020;
    * the Feldman & Zhang 2020 memorization proxy): how much does each
    * document's own training update reduce its own loss? For the q303
    * linear scorer the per-doc gradient at checkpoint i is err_i·x, so
    * TracIn's Σᵢ ∇ℓᵢ(d)·∇ℓᵢ(d) collapses to
    *   si(d) = ‖x_d‖² · Σᵢ errm_i²,   errm = fd(err, 10³)
    * (milli-scaled errors keep the product exact int64 at ANY corpus
    * size: ‖x‖² ≤ ~10⁶ on the declared feature grids and Σ errm² ≤
    * 3·10⁶, so si ≤ 3·10¹² — per-doc, never corpus-summed). High
    * self-influence = atypical/memorized candidates (the
    * inspect-before-training list); the output is a 1–3–10 ladder
    * band census (decades alone collapse this statistic: ‖x‖²·Σerrm²
    * spreads within ~1.5 decades on near-full-scale errors) with
    * label composition and the per-band max. Complements q317
    * (trajectory SHAPE) and q318 (label contradiction) — this is
    * gradient MAGNITUDE.
    *
    * Scale: the per-(doc, step) error frame is the q303 training pass
    * itself (3 broadcast-weight projections); the census is one
    * doc-keyed agg + one band-keyed agg, both map-side combinable. */
  val q319 = QueryDef(
    "q319_tracin_self_influence", {
      val errm = fdSql("g.err", "1000")
      gdPrefixSql + s""",
      |g AS (
      |  SELECT doc_id, y, err FROM e1
      |  UNION ALL SELECT doc_id, y, err FROM e2
      |  UNION ALL SELECT doc_id, y, err FROM e3),
      |se AS (
      |  SELECT g.doc_id, MAX(g.y) AS y,
      |    CAST(SUM(($errm) * ($errm)) AS BIGINT) AS se2
      |  FROM g GROUP BY 1),
      |nx AS (
      |  SELECT doc_id, x0*x0 + x1*x1 + x2*x2 + x3*x3 AS nx FROM feat),
      |si AS (
      |  SELECT se.y, CAST(nx.nx * se.se2 AS BIGINT) AS si
      |  FROM se JOIN nx ON nx.doc_id = se.doc_id)
      |SELECT CAST(CASE WHEN si >= 1000000000000 THEN 9
      |    WHEN si >= 300000000000 THEN 8
      |    WHEN si >= 100000000000 THEN 7
      |    WHEN si >= 30000000000 THEN 6
      |    WHEN si >= 10000000000 THEN 5
      |    WHEN si >= 3000000000 THEN 4
      |    WHEN si >= 1000000000 THEN 3
      |    WHEN si >= 300000000 THEN 2
      |    WHEN si >= 100000000 THEN 1 ELSE 0 END AS BIGINT) AS si_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(y) AS BIGINT) AS n_label_pos,
      |  CAST(MAX(si) AS BIGINT) AS si_max
      |FROM si GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val errs = QualityClassifier.stepErrors(feat)
    val se = errs
      .withColumn("errm", fdCol(col("err"), lit(1000L)))
      .groupBy(col("doc_id"))
      .agg(max(col("y")).as("y"),
        sum(col("errm") * col("errm")).as("se2"))
    val nx = feat.select(col("doc_id"),
      expr("x0*x0 + x1*x1 + x2*x2 + x3*x3").as("nx"))
    se.join(nx, "doc_id")
      .select(col("y"), (col("nx") * col("se2")).as("si"))
      .groupBy(expr("""CASE WHEN si >= 1000000000000 THEN 9L
        | WHEN si >= 300000000000 THEN 8L
        | WHEN si >= 100000000000 THEN 7L
        | WHEN si >= 30000000000 THEN 6L
        | WHEN si >= 10000000000 THEN 5L
        | WHEN si >= 3000000000 THEN 4L
        | WHEN si >= 1000000000 THEN 3L
        | WHEN si >= 300000000 THEN 2L
        | WHEN si >= 100000000 THEN 1L ELSE 0L END""".stripMargin)
        .as("si_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_label_pos"),
        max(col("si")).as("si_max"))
      .orderBy("si_band")
  }

  // ---------------------------------------------------------------------
  // q320 — IPF raking of the source × language table
  // ---------------------------------------------------------------------

  /** q320 — ITERATIVE PROPORTIONAL FITTING (raking; Deming & Stephan
    * 1940) of the (source × language) document table to uniform
    * marginals — the two-facet balancing act single-axis mixers (q48
    * rates, q315 budgets, q304 α) cannot express: resample weights
    * that simultaneously level sources AND languages. Exact-integer
    * IPF on the micro-doc grid: m⁰ = 10⁶·N_sl; two full sweeps, each
    *   row step  m ← ⌊m · R_s / rowsum(m)⌋   (R_s = ⌊10⁶·N/|S|⌋),
    *   col step  m ← ⌊m · C_l / colsum(m)⌋   (C_l = ⌊10⁶·N/|L|⌋);
    * all quantities positive (plain floor division), products ≤
    * (10⁶N)² — int64-exact for corpora ≤ ~3·10⁶ docs, the documented
    * headroom (beyond: DECIMAL(38), the q312 hatch). Output per cell:
    * docs, fitted micro-docs, and the implied per-doc resample weight
    * (ppm) a q70-style weighted sampler consumes.
    *
    * Scale: one (source, lang) keyed count collapses the corpus to a
    * |S|·|L|-cell table; every IPF step is a keyed agg + broadcast
    * join on that bounded frame. */
  val q320 = QueryDef(
    "q320_ipf_raking", {
      def rowStep(i: Int, prev: String): String = s""",
      |rs$i AS (SELECT source, CAST(SUM(m) AS BIGINT) AS rsum
      |  FROM $prev GROUP BY 1),
      |r$i AS (
      |  SELECT p.source, p.lang, p.n_docs,
      |    CAST(p.m * t.rt // rs.rsum AS BIGINT) AS m
      |  FROM $prev p JOIN rs$i rs ON rs.source = p.source
      |  CROSS JOIN t)""".stripMargin
      def colStep(i: Int, prev: String): String = s""",
      |cs$i AS (SELECT lang, CAST(SUM(m) AS BIGINT) AS csum
      |  FROM $prev GROUP BY 1),
      |c$i AS (
      |  SELECT p.source, p.lang, p.n_docs,
      |    CAST(p.m * t.ct // cs.csum AS BIGINT) AS m
      |  FROM $prev p JOIN cs$i cs ON cs.lang = p.lang
      |  CROSS JOIN t)""".stripMargin
      """WITH cell AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(1000000 * COUNT(*) AS BIGINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(1000000 * SUM(n_docs) //
      |      COUNT(DISTINCT source) AS BIGINT) AS rt,
      |    CAST(1000000 * SUM(n_docs) //
      |      COUNT(DISTINCT lang) AS BIGINT) AS ct
      |  FROM cell)""".stripMargin +
        rowStep(1, "cell") + colStep(1, "r1") +
        rowStep(2, "c1") + colStep(2, "r2") + """
      |SELECT source, lang, n_docs, m AS fitted_micro,
      |  CAST(m // n_docs AS BIGINT) AS weight_ppm
      |FROM c2 ORDER BY source, lang""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    val cell0 = Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("m", col("n_docs") * 1000000L)
    val cell = Checkpoints.pin(cell0.localCheckpoint())
    val t = cell.agg(
      expr("1000000L * sum(n_docs) div count(DISTINCT source)").as("rt"),
      expr("1000000L * sum(n_docs) div count(DISTINCT lang)").as("ct"))
    def rowStep(p: DataFrame): DataFrame = {
      val rs = p.groupBy(col("source")).agg(sum(col("m")).as("rsum"))
      p.join(broadcast(rs), "source").crossJoin(broadcast(t))
        .select(col("source"), col("lang"), col("n_docs"),
          expr("m * rt div rsum").as("m"))
    }
    def colStep(p: DataFrame): DataFrame = {
      val cs = p.groupBy(col("lang")).agg(sum(col("m")).as("csum"))
      p.join(broadcast(cs), "lang").crossJoin(broadcast(t))
        .select(col("source"), col("lang"), col("n_docs"),
          expr("m * ct div csum").as("m"))
    }
    val fitted = colStep(rowStep(Checkpoints.pin(
      colStep(rowStep(cell)).localCheckpoint())))
    fitted
      .select(col("source"), col("lang"), col("n_docs"),
        col("m").as("fitted_micro"),
        expr("m div n_docs").as("weight_ppm"))
      .orderBy("source", "lang")
  }

  // ---------------------------------------------------------------------
  // q321 — greedy max-coverage source selection
  // ---------------------------------------------------------------------

  /** q321 — GREEDY MAX-COVERAGE source selection (the Nemhauser,
    * Wolsey & Fisher 1978 (1−1/e) greedy on the coverage submodular):
    * which K sources, bought in order, cover the most of the corpus's
    * bigram vocabulary? The selection counterpart of q314's removal
    * counterfactual and q110's pairwise overlap — a data-buying /
    * shard-prioritization census. Three unrolled greedy rounds: pick
    * the source with the largest UNCOVERED-bigram gain (ties → source
    * name), fold its bigrams into the covered set, repeat. Bigram
    * types (the q101 unit) because this corpus's unigram vocabulary
    * is fully shared (31 types — q314's honest-null exclusive-vocab
    * reading); bigrams differentiate sources. A round whose best
    * remaining gain is zero emits no row (greedy stops buying),
    * stated semantics in both engines. Output per round: source,
    * marginal gain, covered total, coverage ppm of |V|.
    *
    * Scale: the working frame is the DISTINCT (source, bigram) census
    * — |S|·|V|-bounded, NOT corpus-sized — built in one exploded
    * distinct; each round is one anti-join + keyed count on it, a
    * 1-row argmax (TakeOrdered on the |S|-row gain frame), and a
    * bounded covered-set union, all checkpoint-pinned (the q304
    * round discipline). */
  val q321 = QueryDef(
    "q321_greedy_coverage", {
      def pick(i: Int, notIn: String, coveredPrev: Option[Int]):
          String = {
        val uncov = coveredPrev.map(c =>
          s"LEFT JOIN c$c ON c$c.b = st.b WHERE c$c.b IS NULL AND ")
          .getOrElse("WHERE ")
        s""",
        |g$i AS (
        |  SELECT st.source, CAST(COUNT(*) AS BIGINT) AS gain
        |  FROM st $uncov st.source NOT IN ($notIn)
        |  GROUP BY 1),
        |p$i AS MATERIALIZED (
        |  SELECT source, gain FROM g$i
        |  ORDER BY gain DESC, source LIMIT 1),
        |c$i AS MATERIALIZED (
        |  SELECT DISTINCT b FROM (${coveredPrev.map(c =>
          s"SELECT b FROM c$c UNION ALL ").getOrElse("")}
        |    SELECT st.b FROM st JOIN p$i ON p$i.source = st.source))"""
          .stripMargin
      }
      def outRow(i: Int) =
        s"""SELECT CAST($i AS BIGINT) AS round, p$i.source,
           | p$i.gain AS gain_new_types,
           | (SELECT CAST(COUNT(*) AS BIGINT) FROM c$i)
           |   AS covered_total,
           | CAST(1000000 * (SELECT COUNT(*) FROM c$i) // nv.nv
           |   AS BIGINT) AS coverage_ppm
           |FROM p$i CROSS JOIN nv""".stripMargin
      """WITH l AS (
      |  SELECT source, string_split(text, ' ') AS toks FROM documents),
      |e AS (
      |  SELECT source, toks, unnest(range(1, len(toks))) AS i
      |  FROM l WHERE len(toks) >= 2),
      |st AS (
      |  SELECT DISTINCT source,
      |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS b
      |  FROM e),
      |nv AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nv FROM st)"""
        .stripMargin +
        pick(1, "SELECT NULL WHERE FALSE", None) +
        pick(2, "SELECT source FROM p1", Some(1)) +
        pick(3, "SELECT source FROM p1 UNION ALL SELECT source FROM p2",
          Some(2)) +
        "\nSELECT * FROM (" + (1 to 3).map(outRow).mkString(
          " UNION ALL ") + ") ORDER BY round"
    }) { (s, d) =>
    import graft.functions.Checkpoints
    val st = Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("source"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(col("source"),
          concat(expr("element_at(toks, i)"), lit(" "),
            expr("element_at(toks, i + 1)")).as("b"))
        .distinct()
        .localCheckpoint())
    val nv = st.agg(countDistinct(col("b")).as("nv"))
    var covered: Option[DataFrame] = None
    var picked: Option[DataFrame] = None
    val rows = (1 to 3).map { r =>
      val remaining = picked.fold(st)(p =>
        st.join(broadcast(p), Seq("source"), "left_anti"))
      val fresh = covered.fold(remaining)(c =>
        remaining.join(c, Seq("b"), "left_anti"))
      val pick = Checkpoints.pin(
        fresh.groupBy(col("source")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("source")).limit(1)
          .localCheckpoint())
      val newCov = st.join(broadcast(pick.select(col("source"))),
        Seq("source")).select(col("b"))
      covered = Some(Checkpoints.pin(
        covered.fold(newCov.distinct())(c =>
          c.unionByName(newCov).distinct()).localCheckpoint()))
      picked = Some(Checkpoints.pin(
        picked.fold(pick.select(col("source")))(p =>
          p.unionByName(pick.select(col("source"))))
          .localCheckpoint()))
      val covCnt = covered.get.agg(count(lit(1)).as("covered_total"))
      pick.crossJoin(broadcast(covCnt)).crossJoin(broadcast(nv))
        .select(lit(r.toLong).as("round"), col("source"),
          col("gain").as("gain_new_types"), col("covered_total"),
          expr("1000000L * covered_total div nv").as("coverage_ppm"))
    }
    rows.reduce(_ unionByName _).orderBy("round")
  }

  // ---------------------------------------------------------------------
  // q315 — UniMax budget allocation (epoch-capped water-filling)
  // ---------------------------------------------------------------------

  /** q315 — UNIMAX BUDGET ALLOCATION (Chung et al. 2023): distribute a
    * training token budget across languages as uniformly as possible
    * subject to a per-language epoch cap — the fairness-motivated
    * alternative to temperature sampling (q102) and excess-loss
    * reweighting (q304). Spec constants: epoch cap E = 2, budget
    * B = ⌊3N/2⌋ (N = corpus tokens — the budget scales with the
    * corpus, so the semantics are SF-independent). The exact
    * water-filling closed form: sort languages ascending by cap
    * c_d = E·n_d; the fully-capped prefix is
    *   k* = max{k : c_(k)·(D−k+1) + pfx_(k−1) ≤ B}
    * (the feasibility gap g(k) is nondecreasing in k for sorted caps,
    * so the feasible set is a prefix and MAX is sound), and everyone
    * past k* gets the level L = ⌊(B − pfx_(k*)) / (D−k*)⌋. Output per
    * language: tokens, cap, allocation, realized epochs (ppm, floor),
    * capped flag. All int64-exact (B−pfx ≥ 0 by the k* condition, so
    * plain floor division is safe everywhere).
    *
    * Scale: one token-count keyed agg (map-side combinable) collapses
    * the corpus to the |languages|-row census; the sort window, the
    * feasibility scan, and the one-row (k*, pfx, B) frame all ride
    * that bounded frame — nothing downstream of the scan grows with
    * the data. */
  val q315 = QueryDef(
    "q315_unimax_allocation",
    """WITH nd AS (
      |  SELECT lang,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS n_total,
      |  CAST(COUNT(*) AS BIGINT) AS n_lang FROM nd),
      |c AS (
      |  SELECT lang, n_tok, 2 * n_tok AS cap,
      |    CAST(ROW_NUMBER() OVER (ORDER BY 2 * n_tok, lang) AS BIGINT)
      |      AS rn,
      |    CAST(SUM(2 * n_tok) OVER (ORDER BY 2 * n_tok, lang
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
      |  FROM nd),
      |f AS (
      |  SELECT c.*, t.n_lang, (3 * t.n_total) // 2 AS b,
      |    CASE WHEN c.cap * (t.n_lang - c.rn + 1) + c.pfx - c.cap
      |      <= (3 * t.n_total) // 2 THEN 1 ELSE 0 END AS ok
      |  FROM c CROSS JOIN t),
      |k AS (
      |  SELECT CAST(MAX(CASE WHEN ok = 1 THEN rn ELSE 0 END) AS BIGINT)
      |      AS kstar,
      |    CAST(MAX(CASE WHEN ok = 1 THEN pfx ELSE 0 END) AS BIGINT)
      |      AS pks,
      |    MAX(b) AS b, MAX(n_lang) AS d
      |  FROM f),
      |o AS (
      |  SELECT f.lang, f.n_tok, f.cap,
      |    CAST(CASE WHEN f.rn <= k.kstar THEN f.cap
      |      ELSE (k.b - k.pks) // GREATEST(1, k.d - k.kstar) END
      |      AS BIGINT) AS alloc_tokens,
      |    CAST(CASE WHEN f.rn <= k.kstar THEN 1 ELSE 0 END AS BIGINT)
      |      AS is_capped
      |  FROM f CROSS JOIN k)
      |SELECT lang, n_tok, cap AS cap_tokens, alloc_tokens,
      |  CAST(1000000 * alloc_tokens // n_tok AS BIGINT) AS epochs_ppm,
      |  is_capped
      |FROM o ORDER BY lang""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val nd = Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("n_tok"))
    val t = nd.agg(sum(col("n_tok")).as("n_total"),
      count(lit(1)).as("n_lang"))
    // the sort window rides the |languages|-row census — bounded by
    // construction, never the corpus (PlanSpec-allowlisted)
    val w = Window.orderBy(col("cap"), col("lang"))
    val c = nd.withColumn("cap", col("n_tok") * 2L)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pfx", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val f = c.crossJoin(broadcast(t))
      .withColumn("b", expr("(3 * n_total) div 2"))
      .withColumn("ok",
        when(col("cap") * (col("n_lang") - col("rn") + 1L)
          + col("pfx") - col("cap") <= col("b"), 1L).otherwise(0L))
    val k = f.agg(
      max(when(col("ok") === 1L, col("rn")).otherwise(0L)).as("kstar"),
      max(when(col("ok") === 1L, col("pfx")).otherwise(0L)).as("pks"),
      max(col("b")).as("bb"), max(col("n_lang")).as("dd"))
    f.crossJoin(broadcast(k))
      .withColumn("alloc_tokens",
        when(col("rn") <= col("kstar"), col("cap"))
          .otherwise(expr(
            "(bb - pks) div greatest(1L, dd - kstar)")))
      .select(col("lang"), col("n_tok"), col("cap").as("cap_tokens"),
        col("alloc_tokens"),
        expr("1000000L * alloc_tokens div n_tok").as("epochs_ppm"),
        when(col("rn") <= col("kstar"), 1L).otherwise(0L)
          .as("is_capped"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------------
  // q314 — leave-one-source-out ablation census
  // ---------------------------------------------------------------------

  /** q314 — SOURCE ABLATION census, the leave-one-out question every
    * mixture decision ultimately reduces to ("what does this source
    * actually contribute?") answered WITHOUT materializing |D| ablated
    * corpora: corpus-level statistics are sums, so every
    * leave-one-out value is totals-minus-this-source arithmetic in the
    * same pass (the algebraic LOO trick — one scan, |D| ablations).
    * Per source: docs, tokens, token share (ppm), EXCLUSIVE vocabulary
    * (types appearing in no other source — what is irrecoverably lost
    * if the source is dropped; zero across this shared-vocab synthetic
    * corpus, the honest null), mean token length (milli), and the LOO
    * delta on corpus mean token length (milli) — drop the source,
    * this is how the corpus-level statistic moves. Complements q304
    * (which REWEIGHTS sources by excess loss) and q110/q276 (overlap/
    * divergence): this is the removal counterfactual.
    *
    * Scale: one (source, token) census for the exclusivity census
    * (|V|-bounded, the q130 frame), one per-source keyed agg, one
    * broadcast one-row total — all map-side-combinable; nothing
    * scales past the scan. */
  val q314 = QueryDef(
    "q314_source_ablation",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |st AS (SELECT source, t FROM tok GROUP BY 1, 2),
      |excl AS (
      |  SELECT MAX(source) AS source, t FROM st
      |  GROUP BY t HAVING COUNT(*) = 1),
      |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab_exclusive
      |  FROM excl GROUP BY 1),
      |s AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS ch,
      |  CAST(SUM(toks) AS BIGINT) AS tk FROM s)
      |SELECT s.source, s.n_docs, s.toks,
      |  CAST(1000000 * s.toks // tot.tk AS BIGINT) AS token_share_ppm,
      |  CAST(COALESCE(ex.vocab_exclusive, 0) AS BIGINT)
      |    AS vocab_exclusive,
      |  CAST(1000 * s.chars // s.toks AS BIGINT) AS mtl_milli,
      |  CAST(1000 * (tot.ch - s.chars) // (tot.tk - s.toks)
      |    - 1000 * tot.ch // tot.tk AS BIGINT) AS loo_mtl_delta_milli
      |FROM s LEFT JOIN ex ON ex.source = s.source CROSS JOIN tot
      |ORDER BY s.source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val st = docs
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    val ex = st.groupBy(col("t"))
      .agg(count(lit(1)).as("nsrc"), max(col("source")).as("source"))
      .filter(col("nsrc") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("vocab_exclusive"))
    val sAgg = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("toks"))
    val tot = sAgg.agg(sum(col("chars")).as("ch"), sum(col("toks")).as("tk"))
    sAgg.join(ex, Seq("source"), "left").crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("toks"),
        expr("1000000L * toks div tk").as("token_share_ppm"),
        coalesce(col("vocab_exclusive"), lit(0L)).as("vocab_exclusive"),
        expr("1000L * chars div toks").as("mtl_milli"),
        expr("1000L * (ch - chars) div (tk - toks) - 1000L * ch div tk")
          .as("loo_mtl_delta_milli"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q323 — Borda rank-aggregation of quality signals
  // ---------------------------------------------------------------------

  /** q323 — BORDA RANK-AGGREGATION of quality signals (Borda 1781;
    * Dwork et al. 2001 "Rank aggregation methods for the Web" — the
    * MC/Borda family as the practical Kemeny approximation): fuse
    * three per-document quality signals (token count, char count,
    * stopword count — the q85 Gopher raw inputs) into ONE consensus
    * ordering without learning weights, the unsupervised ensemble
    * beside q303's trained scorer. Each signal ranks ascending by
    * COMPETITION rank (ties share the min rank — 1 + #docs strictly
    * below), computed from the signal's VALUE CENSUS: a prefix sum
    * over the bounded distinct-value frame broadcast-joined back, so
    * no global window ever touches the corpus. Borda score = Σ ranks;
    * the output is the scale-free decile census of the score
    * (band = ⌊10·(score−3)/(3n−2)⌋) with the cross-signal rank SPREAD
    * (max−min rank per doc) — low-spread bands are signal-consensus
    * docs, high-spread bands the disagreement frontier a curator
    * inspects. All exact int64 (score ≤ 3n; 10·score wraps only past
    * n ≈ 3·10¹⁷).
    *
    * Scale: three value censuses (map-side combinable, bounded by the
    * signals' VALUE RANGES, never the corpus), three broadcast
    * rank-joins, one per-doc projection, one ≤10-row keyed census. */
  val q323 = QueryDef(
    "q323_borda_ensemble", {
      def rankCte(i: Int, vExpr: String) = s"""
        |c$i AS (SELECT $vExpr AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM f GROUP BY 1),
        |r$i AS (SELECT v, CAST(COALESCE(SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |  AS BIGINT) AS r FROM c$i)""".stripMargin
      s"""WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS v1,
      |    CAST(n_chars AS BIGINT) AS v2,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS v3
      |  FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),${
        rankCte(1, "v1")},${rankCte(2, "v2")},${rankCte(3, "v3")},
      |j AS (
      |  SELECT f.doc_id, r1.r AS ra, r2.r AS rb, r3.r AS rc
      |  FROM f JOIN r1 ON r1.v = f.v1 JOIN r2 ON r2.v = f.v2
      |    JOIN r3 ON r3.v = f.v3),
      |sc AS (
      |  SELECT doc_id, ra + rb + rc AS score,
      |    GREATEST(ra, rb, rc) - LEAST(ra, rb, rc) AS spread
      |  FROM j)
      |SELECT CAST(((score - 3) * 10) // (3 * n.n - 2) AS BIGINT)
      |    AS borda_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(spread) AS BIGINT) AS sum_spread,
      |  CAST(SUM(spread) // COUNT(*) AS BIGINT) AS mean_spread,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score
      |FROM sc CROSS JOIN n GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Checkpoints
    // eager checkpoint + pin, not cache(): f feeds three census
    // subtrees plus the final join — concurrent broadcast consumers
    // (the measured q310 cache race)
    val f = Checkpoints.pin(
      Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("v1"),
        col("n_chars").cast("long").as("v2"),
        size(filter(split(col("text"), " "),
          t => t.isin("the", "a", "of", "and"))).cast("long").as("v3"))
        .localCheckpoint())
    val n = f.agg(count(lit(1)).as("n"))
    def rankOf(vc: String): org.apache.spark.sql.DataFrame = {
      // the prefix window rides the bounded distinct-VALUE census
      // (value-range-bounded, never corpus-sized) — PlanSpec
      // window-allowlisted
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      f.groupBy(col(vc).as("v")).agg(count(lit(1)).as("c"))
        .select(col("v"),
          (coalesce(sum(col("c")).over(w), lit(0L)) + 1L).as("r"))
    }
    val j = f
      .join(broadcast(rankOf("v1").select(col("v").as("v1"),
        col("r").as("ra"))), Seq("v1"))
      .join(broadcast(rankOf("v2").select(col("v").as("v2"),
        col("r").as("rb"))), Seq("v2"))
      .join(broadcast(rankOf("v3").select(col("v").as("v3"),
        col("r").as("rc"))), Seq("v3"))
      .select(
        (col("ra") + col("rb") + col("rc")).as("score"),
        (greatest(col("ra"), col("rb"), col("rc"))
          - least(col("ra"), col("rb"), col("rc"))).as("spread"))
    j.crossJoin(broadcast(n))
      .groupBy(expr("((score - 3L) * 10) div (3L * n - 2)")
        .as("borda_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("spread")).as("sum_spread"),
        expr("sum(spread) div count(1)").as("mean_spread"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy("borda_band")
  }

  // ---------------------------------------------------------------------
  // q324 — curriculum pacing schedule (competence-based admission)
  // ---------------------------------------------------------------------

  /** q324 — CURRICULUM PACING schedule (Bengio et al. 2009;
    * competence function c(t) = √(t/T) of Platanios et al. 2019): when
    * does each document ENTER training under a difficulty-ordered
    * curriculum? Difficulty = token count (the Platanios sentence-
    * length difficulty); the 4-epoch √-competence ladder is the
    * DECLARED ppm constant vector c = (500000, 707107, 866025,
    * 1000000) — spec constants like Buckets' cut points, not
    * data-derived. A document (and its whole difficulty tie-group —
    * all-or-nothing, stated) is admitted at the first epoch t with
    * 10⁶·below < c_t·n, where below = #docs strictly easier — so
    * admission needs only the difficulty VALUE CENSUS and its prefix
    * sum, never a per-doc global rank. Output per epoch: newly
    * admitted docs, cumulative docs, min/max/floored-mean difficulty
    * of the new intake — the curriculum's data-loading manifest. An
    * epoch whose competence window admits nothing emits no row
    * (stated in both engines).
    *
    * Scale: one map-side value census + a prefix window over it
    * (bounded by the difficulty value range, never the corpus), one
    * one-row count, a ≤4-row epoch census + its prefix window. 10⁶·n
    * wraps int64 only past n ≈ 9·10¹². */
  val q324 = QueryDef(
    "q324_curriculum_pacing",
    """WITH f AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS d
      |  FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
      |c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1),
      |p AS (
      |  SELECT d, c, CAST(COALESCE(SUM(c) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS below
      |  FROM c),
      |e AS (
      |  SELECT d, c, CASE
      |      WHEN 1000000 * below < 500000 * n.n THEN 1
      |      WHEN 1000000 * below < 707107 * n.n THEN 2
      |      WHEN 1000000 * below < 866025 * n.n THEN 3
      |      ELSE 4 END AS epoch
      |  FROM p CROSS JOIN n),
      |g AS (
      |  SELECT CAST(epoch AS BIGINT) AS epoch,
      |    CAST(SUM(c) AS BIGINT) AS n_new_docs,
      |    CAST(MIN(d) AS BIGINT) AS min_difficulty,
      |    CAST(MAX(d) AS BIGINT) AS max_difficulty,
      |    CAST(SUM(d * c) // SUM(c) AS BIGINT) AS mean_difficulty
      |  FROM e GROUP BY 1)
      |SELECT epoch, n_new_docs,
      |  CAST(SUM(n_new_docs) OVER (ORDER BY epoch
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS n_cum_docs,
      |  min_difficulty, max_difficulty, mean_difficulty
      |FROM g ORDER BY epoch""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("d"))
    val n = f.agg(count(lit(1)).as("n"))
    // both prefix windows ride bounded frames (difficulty value
    // census; ≤4-row epoch census) — PlanSpec window-allowlisted
    val wd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val p = f.groupBy(col("d")).agg(count(lit(1)).as("c"))
      .select(col("d"), col("c"),
        coalesce(sum(col("c")).over(wd), lit(0L)).as("below"))
    val e = p.crossJoin(broadcast(n))
      .select(col("d"), col("c"),
        when(lit(1000000L) * col("below") < lit(500000L) * col("n"), 1L)
          .when(lit(1000000L) * col("below") < lit(707107L) * col("n"), 2L)
          .when(lit(1000000L) * col("below") < lit(866025L) * col("n"), 3L)
          .otherwise(4L).as("epoch"))
    val g = e.groupBy(col("epoch"))
      .agg(sum(col("c")).as("n_new_docs"),
        min(col("d")).as("min_difficulty"),
        max(col("d")).as("max_difficulty"),
        expr("sum(d * c) div sum(c)").as("mean_difficulty"))
    val we = Window.orderBy(col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.select(col("epoch"), col("n_new_docs"),
        sum(col("n_new_docs")).over(we).as("n_cum_docs"),
        col("min_difficulty"), col("max_difficulty"),
        col("mean_difficulty"))
      .orderBy("epoch")
  }

  // ---------------------------------------------------------------------
  // q328 — exact Data-Shapley source valuation (coverage game)
  // ---------------------------------------------------------------------

  /** q328 — EXACT DATA-SHAPLEY valuation of sources (Ghorbani & Zou
    * 2019's framing, computed EXACTLY — no Monte Carlo — for the
    * bigram-coverage utility v(S) = |∪_{s∈S} B_s|): the coverage game
    * decomposes into one elementary game per bigram (worth 1 to any
    * coalition holding a coverer), and the Shapley value of an
    * m-coverer elementary game splits the unit equally — so
    * φ_s = Σ_{b ∈ B_s} 1/m_b, computed from the (source, bigram)
    * census and the per-bigram coverer count alone. The axiomatic
    * completion of the selection suite: q314's LOO is v(N)−v(N∖{s})
    * (= the exclusive-type count, a column here), q321's greedy buys
    * marginal coverage — Shapley prices EVERY marginal position at
    * once. Exact integers: m_b ∈ 1..|S| = 20, so each term rides the
    * lcm(1..20) = 232,792,560 grid (L/m_b exact), Σφ·L = L·|V| —
    * the EFFICIENCY axiom as a spec invariant. share_ppm floors
    * 10⁶·φ/|V|; int64 needs |V| ≤ 3.9·10⁴ on this grid (this
    * corpus's 31-token unigram vocab bounds |V| ≤ 961 at ANY SF;
    * beyond: DECIMAL, the q312 hatch).
    *
    * Scale: one exploded DISTINCT (source, bigram) census
    * (|S|·|V|-bounded, the q321 working frame), one |V|-row coverer
    * count, one join on the bigram key, one |S|-row keyed agg —
    * corpus-sized work only in the first explode. */
  val q328 = QueryDef(
    "q328_source_shapley",
    """WITH l AS (
      |  SELECT source, string_split(text, ' ') AS toks FROM documents),
      |e AS (
      |  SELECT source, toks, unnest(range(1, len(toks))) AS i
      |  FROM l WHERE len(toks) >= 2),
      |sb AS (
      |  SELECT DISTINCT source,
      |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS b
      |  FROM e),
      |mb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS m FROM sb
      |  GROUP BY 1),
      |vt AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM mb),
      |ps AS (
      |  SELECT sb.source, CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(CASE WHEN mb.m = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_exclusive,
      |    CAST(SUM(232792560 // mb.m) AS BIGINT) AS phi_xl
      |  FROM sb JOIN mb ON mb.b = sb.b GROUP BY 1)
      |SELECT source, n_types, n_exclusive, phi_xl,
      |  CAST((1000000 * phi_xl) // (232792560 * vt.v) AS BIGINT)
      |    AS share_ppm
      |FROM ps CROSS JOIN vt ORDER BY source""".stripMargin) { (s, d) =>
    import graft.functions.Checkpoints
    // eager checkpoint + pin, not cache(): sb feeds the coverer
    // census, the join, and (via mb) the broadcast |V| frame —
    // concurrent broadcast consumers (the measured q310 cache race)
    val sb = Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("source"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(col("source"),
          concat(expr("element_at(toks, i)"), lit(" "),
            expr("element_at(toks, i + 1)")).as("b"))
        .distinct()
        .localCheckpoint())
    val mb = Checkpoints.pin(
      sb.groupBy(col("b")).agg(count(lit(1)).as("m")).localCheckpoint())
    val vt = mb.agg(count(lit(1)).as("v"))
    sb.join(mb, "b")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("m") === 1L, 1L).otherwise(0L)).as("n_exclusive"),
        sum(expr("232792560L div m")).as("phi_xl"))
      .crossJoin(broadcast(vt))
      .select(col("source"), col("n_types"), col("n_exclusive"),
        col("phi_xl"),
        expr("(1000000L * phi_xl) div (232792560L * v)")
          .as("share_ppm"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q329 — token-budget knapsack selection (density greedy)
  // ---------------------------------------------------------------------

  /** q329 — TOKEN-BUDGET KNAPSACK selection, density-greedy census
    * (Dantzig 1957's greedy solves the knapsack LP relaxation
    * exactly; within one band of optimal for the integer program):
    * under a training-token budget B = ⌊N/4⌋, which documents does a
    * value-per-token curator admit? Value = distinct-type count
    * (lexical diversity), cost = token count, density quantized to
    * the permille band rb = ⌊(10⁶·value/cost)/1000⌋ ∈ 0..1000 — the
    * band ladder IS the greedy order, so admission needs only the
    * ≤1001-row band census and its descending prefix sum, never a
    * per-doc global sort (the q236/q294 census-first discipline).
    * Output per band: docs, tokens, cumulative tokens, and status
    * 2 = fully admitted / 1 = boundary band (the greedy's fractional
    * band — the curator's tie-break zone) / 0 = excluded. The
    * budget-constrained completion of the selection suite: q321/q328
    * price SOURCES, q324 orders by difficulty — this packs by
    * value-density under a hard budget.
    *
    * Scale: one per-row projection, one ≤1001-row keyed census, a
    * prefix window over it, a one-row total frame. 10⁶·value wraps
    * int64 only past 9·10¹² types/doc — never. */
  val q329 = QueryDef(
    "q329_budget_knapsack",
    """WITH f AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS cost,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS val
      |  FROM documents),
      |t AS (SELECT CAST(SUM(cost) AS BIGINT) AS tot FROM f),
      |bnd AS (
      |  SELECT CAST(((1000000 * val) // cost) // 1000 AS BIGINT) AS rb,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(cost) AS BIGINT) AS tokens
      |  FROM f GROUP BY 1),
      |c AS (
      |  SELECT rb, n_docs, tokens,
      |    CAST(SUM(tokens) OVER (ORDER BY rb DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_tokens
      |  FROM bnd)
      |SELECT c.rb AS ratio_band, c.n_docs, c.tokens, c.cum_tokens,
      |  CAST(CASE WHEN c.cum_tokens <= t.tot // 4 THEN 2
      |    WHEN c.cum_tokens - c.tokens < t.tot // 4 THEN 1
      |    ELSE 0 END AS BIGINT) AS status
      |FROM c CROSS JOIN t ORDER BY ratio_band DESC""".stripMargin) {
    (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("cost"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("val"))
    val t = f.agg(sum(col("cost")).as("tot"))
    // the prefix window rides the ≤1001-row permille band census —
    // PlanSpec window-allowlisted
    val w = Window.orderBy(col("rb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.groupBy(expr("((1000000L * val) div cost) div 1000").as("rb"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cost")).as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .crossJoin(broadcast(t))
      .select(col("rb").as("ratio_band"), col("n_docs"), col("tokens"),
        col("cum_tokens"),
        when(col("cum_tokens") <= expr("tot div 4"), 2L)
          .when(col("cum_tokens") - col("tokens") < expr("tot div 4"),
            1L)
          .otherwise(0L).as("status"))
      .orderBy(col("ratio_band").desc)
  }

  // ---------------------------------------------------------------------
  // q330 — domain gradient-conflict census
  // ---------------------------------------------------------------------

  /** q330 — DOMAIN GRADIENT-CONFLICT census (Yu et al. 2020 PCGrad's
    * diagnostic: two task/domain gradients with negative cosine fight
    * each other at every shared update): under q303's final
    * checkpoint w₃, compute each source's MEAN gradient of the
    * training loss, ḡ_s = ⌊Σ_{i∈s} err_i·x_i / n_s⌋ (sign-safe floor
    * per dimension — numerators are signed), and the pairwise cosine
    * between the |S| mean gradients. Negative-cosine pairs are the
    * mixture's internal conflicts — the sign DoReMi's α (q304)
    * responds to but never shows; this is the map a curator reads
    * before merging sources into one training stream. Exact integers
    * end-to-end: the three Gram numbers (g_a·g_b, ‖g_a‖², ‖g_b‖²)
    * are int64 (mean-gradient entries are N-independent, bounded by
    * err_max·x_max ≈ 10⁹ on this featurizer's grids → Gram terms
    * ≤ 4·10¹⁸, documented); cosine takes the single trailing √ in
    * double (q292's discipline), zero-norm gradients read cos = 0
    * (stated).
    *
    * Scale: the q303 training passes + ONE extra linear pass (err
    * under the broadcast 1-row w₃, keyed by source) → an |S|-row
    * gradient frame; the pair census is the broadcast self-join of
    * that bounded frame (≤ |S|² rows, never corpus-sized). */
  val q330 = QueryDef(
    "q330_gradient_conflict", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      def g(j: Int) = fdSql(s"SUM(err * x$j)", "COUNT(*)")
      gdPrefixSql + s""",
      |ge AS (
      |  SELECT dd.source, f.x0, f.x1, f.x2, f.x3,
      |    $pred - f.y * 1000000 AS err
      |  FROM feat f JOIN documents dd ON dd.doc_id = f.doc_id
      |  CROSS JOIN w3 w),
      |gm AS (
      |  SELECT source, CAST(${g(0)} AS BIGINT) AS g0,
      |    CAST(${g(1)} AS BIGINT) AS g1, CAST(${g(2)} AS BIGINT) AS g2,
      |    CAST(${g(3)} AS BIGINT) AS g3
      |  FROM ge GROUP BY 1),
      |pc AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    CAST(a.g0*b.g0 + a.g1*b.g1 + a.g2*b.g2 + a.g3*b.g3
      |      AS BIGINT) AS dab,
      |    CAST(a.g0*a.g0 + a.g1*a.g1 + a.g2*a.g2 + a.g3*a.g3
      |      AS BIGINT) AS daa,
      |    CAST(b.g0*b.g0 + b.g1*b.g1 + b.g2*b.g2 + b.g3*b.g3
      |      AS BIGINT) AS dbb
      |  FROM gm a JOIN gm b ON a.source < b.source)
      |SELECT src_a, src_b,
      |  CAST(CASE WHEN daa = 0 OR dbb = 0 THEN 0
      |    ELSE FLOOR(1000.0 * dab /
      |      sqrt(CAST(daa AS DOUBLE) * dbb)) END AS BIGINT)
      |    AS cos_milli,
      |  CAST(CASE WHEN dab < 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS conflict
      |FROM pc ORDER BY src_a, src_b""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(QualityClassifier.trainCensus(feat))
    val ge = feat
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id")
      .crossJoin(broadcast(w3))
      .withColumn("err",
        least(lit(1000000L), greatest(lit(0L),
          expr("(x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4")))
          - col("y") * 1000000L)
    val gm = Checkpoints.pin(
      ge.groupBy(col("source"))
        .agg(fdCol(sum(col("err") * col("x0")), count(lit(1))).as("g0"),
          fdCol(sum(col("err") * col("x1")), count(lit(1))).as("g1"),
          fdCol(sum(col("err") * col("x2")), count(lit(1))).as("g2"),
          fdCol(sum(col("err") * col("x3")), count(lit(1))).as("g3"))
        .localCheckpoint())
    val b = gm.select(col("source").as("src_b"), col("g0").as("h0"),
      col("g1").as("h1"), col("g2").as("h2"), col("g3").as("h3"))
    gm.withColumnRenamed("source", "src_a")
      .join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        expr("g0*h0 + g1*h1 + g2*h2 + g3*h3").as("dab"),
        expr("g0*g0 + g1*g1 + g2*g2 + g3*g3").as("daa"),
        expr("h0*h0 + h1*h1 + h2*h2 + h3*h3").as("dbb"))
      .select(col("src_a"), col("src_b"),
        when(col("daa") === 0L || col("dbb") === 0L, 0L)
          .otherwise(expr("cast(floor(1000.0 * dab /" +
            " sqrt(cast(daa as double) * dbb)) as bigint)"))
          .as("cos_milli"),
        when(col("dab") < 0L, 1L).otherwise(0L).as("conflict"))
      .orderBy("src_a", "src_b")
  }

  // ---------------------------------------------------------------------
  // q332 — Horvitz–Thompson debiasing of a gated corpus statistic
  // ---------------------------------------------------------------------

  /** q332 — HORVITZ–THOMPSON debiasing (Horvitz & Thompson 1952) of a
    * statistic computed on a quality-GATED corpus: every filter in
    * the curation funnel (q85's Gopher gates, q303's learned gate)
    * reshapes the surviving sample, and any downstream mean read off
    * the survivors silently inherits that selection. With the
    * per-stratum survival rates OBSERVED (kept_s/n_s per source —
    * known here because the gate ran on the full corpus), the HT
    * estimator reweights each surviving doc by the inverse inclusion
    * rate, removing the BETWEEN-STRATUM composition term of the
    * selection bias exactly; what remains in ht_bias is the
    * within-stratum term (a deterministic gate correlated with the
    * statistic keeps it — stated), so the (naive_bias, ht_bias) pair
    * DECOMPOSES the gate's distortion into composition vs
    * within-stratum parts. Gate: token count ≥ 55 (declared cut, the
    * q85 family); statistic: mean chars/doc. Output one row: true
    * mean (full corpus — computable here, which is what makes the
    * bias MEASURABLE), naive survivor mean, HT estimate
    * ⌊Σ_s ⌊kept_sum_s·n_s/k_s⌋ / N⌋, both bias columns, and the
    * zero-survivor stratum count (those contribute 0 — the HT
    * undercoverage term, reported not hidden). Int64: kept_sum_s·n_s
    * wraps past ~10⁹ docs/stratum on the chars grid (documented;
    * beyond: DECIMAL, the q312 hatch).
    *
    * Scale: one keyed (source) agg over the corpus + a ≤|S|-row fold
    * — nothing else. */
  val q332 = QueryDef(
    "q332_ht_debias",
    s"""WITH f AS (
      |  SELECT source, CAST(n_chars AS BIGINT) AS ch,
      |    CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0
      |      END AS keep
      |  FROM documents),
      |st AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns,
      |    CAST(SUM(keep) AS BIGINT) AS ks,
      |    CAST(SUM(CASE WHEN keep = 1 THEN ch ELSE 0 END) AS BIGINT)
      |      AS kc
      |  FROM f GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(ns) AS BIGINT) AS n,
      |    CAST(SUM(ks) AS BIGINT) AS k,
      |    CAST(SUM(kc) AS BIGINT) AS kcs,
      |    CAST(SUM(CASE WHEN ks > 0 THEN (kc * ns) // ks ELSE 0 END)
      |      AS BIGINT) AS ht_num,
      |    CAST(SUM(CASE WHEN ks = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS dead
      |  FROM st),
      |tr AS (SELECT CAST(SUM(ch) AS BIGINT) AS sc FROM f)
      |SELECT t.n AS n_docs, t.k AS n_kept,
      |  CAST(tr.sc // t.n AS BIGINT) AS true_mean,
      |  CAST(t.kcs // t.k AS BIGINT) AS naive_mean,
      |  CAST(t.ht_num // t.n AS BIGINT) AS ht_mean,
      |  CAST(t.kcs // t.k - tr.sc // t.n AS BIGINT) AS naive_bias,
      |  CAST(t.ht_num // t.n - tr.sc // t.n AS BIGINT) AS ht_bias,
      |  t.dead AS n_dead_strata
      |FROM tot t CROSS JOIN tr
      |WHERE t.k > 0""".stripMargin) { (s, d) =>
    val f = Tables.documents(s, d)
      .select(col("source"), col("n_chars").cast("long").as("ch"),
        when(size(split(col("text"), " ")) >= 55, 1L).otherwise(0L)
          .as("keep"))
    val st = f.groupBy(col("source"))
      .agg(count(lit(1)).as("ns"), sum(col("keep")).as("ks"),
        sum(when(col("keep") === 1L, col("ch")).otherwise(0L)).as("kc"))
    val tot = st.agg(sum(col("ns")).as("n"), sum(col("ks")).as("k"),
      sum(col("kc")).as("kcs"),
      sum(when(col("ks") > 0L, expr("(kc * ns) div ks")).otherwise(0L))
        .as("ht_num"),
      sum(when(col("ks") === 0L, 1L).otherwise(0L)).as("dead"))
    val tr = f.agg(sum(col("ch")).as("sc"))
    tot.crossJoin(broadcast(tr))
      .filter(col("k") > 0)
      .select(col("n").as("n_docs"), col("k").as("n_kept"),
        expr("sc div n").as("true_mean"),
        expr("kcs div k").as("naive_mean"),
        expr("ht_num div n").as("ht_mean"),
        expr("kcs div k - sc div n").as("naive_bias"),
        expr("ht_num div n - sc div n").as("ht_bias"),
        col("dead").as("n_dead_strata"))
  }

  // ---------------------------------------------------------------------
  // q333 — RHO-loss prioritized selection (holdout excess loss)
  // ---------------------------------------------------------------------

  /** Suffixed replica of the q303 GD chain over a FILTERED corpus —
    * q333 trains two disjoint models (parity split), so the shared
    * CTE names must fork. */
  private def chainSql(sfx: String, where: String): String = {
    val head = featSql
      .replace("feat AS (", s"feat$sfx AS (")
      .replace("FROM documents)", s"FROM documents WHERE $where)")
    def step(i: Int): String = {
      val z = "f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3"
      val pred = s"LEAST(1000000, GREATEST(0, ($z + 2000000) // 4))"
      def upd(j: Int) =
        s"CAST(MAX(w.w$j) - (${fdSql(s"SUM(err*x$j)",
          s"MAX(n$sfx.n)*1000")}) AS BIGINT)"
      s""",
      |e$i$sfx AS (
      |  SELECT f.doc_id, f.y, f.x0, f.x1, f.x2, f.x3,
      |    $pred - f.y*1000000 AS err
      |  FROM feat$sfx f CROSS JOIN w${i - 1}$sfx w),
      |w$i$sfx AS (
      |  SELECT ${upd(0)} AS w0, ${upd(1)} AS w1,
      |    ${upd(2)} AS w2, ${upd(3)} AS w3
      |  FROM e$i$sfx, w${i - 1}$sfx w, n$sfx)""".stripMargin
    }
    s"""$head,
    |n$sfx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat$sfx),
    |w0$sfx AS (SELECT CAST(0 AS BIGINT) w0, CAST(0 AS BIGINT) w1,
    |  CAST(0 AS BIGINT) w2, CAST(0 AS BIGINT) w3)""".stripMargin +
      (1 to 3).map(step).mkString
  }

  /** q333 — RHO-LOSS prioritized selection (Mindermann et al. 2022,
    * "prioritize points that are learnable, worth learning, and not
    * yet learnt"): per training-pool document, the REDUCIBLE holdout
    * loss L(x | θ_pool) − L(x | θ_holdout), where θ_holdout is an
    * irreducible-loss model trained on data the pool never sees.
    * Both models are q303 GD chains over a deterministic parity
    * split (pool = odd doc_id, holdout-model = even); per-doc loss is
    * the absolute hard-sigmoid error |σ̂_ppm − 10⁶·y| (the q319 loss
    * family, stated). High-priority bands = noisy-or-hard points the
    * holdout model also fails (worth learning); negative bands =
    * points the holdout model already solves better than the pool
    * model (not yet learnt by θ_pool alone — the classic RHO keep
    * set). Census over the signed priority's 100k-ppm bands with
    * sign-safe floor banding (priorities are signed — fdSql/fdCol).
    *
    * Scale: two independent 3-pass GD chains over disjoint halves
    * (each the q303 cost), then ONE extra linear pass scoring the
    * pool under two broadcast 1-row weight frames; the census is a
    * ≤21-row keyed agg. */
  val q333 = QueryDef(
    "q333_rho_loss", {
      def pred(w: String) = "LEAST(1000000, GREATEST(0, " +
        s"(f.x0*$w.w0 + f.x1*$w.w1 + f.x2*$w.w2 + f.x3*$w.w3" +
        " + 2000000) // 4))"
      s"""WITH ${chainSql("_p", "doc_id % 2 = 1")},
      ${chainSql("_h", "doc_id % 2 = 0")},
      |pr AS (
      |  SELECT f.y,
      |    ABS(${pred("wp")} - f.y*1000000)
      |      - ABS(${pred("wh")} - f.y*1000000) AS prio
      |  FROM feat_p f CROSS JOIN w3_p wp CROSS JOIN w3_h wh)
      |SELECT CAST(${fdSql("prio", "100000")} AS BIGINT) AS prio_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(y) AS BIGINT) AS n_pos,
      |  CAST(SUM(prio) AS BIGINT) AS sum_prio,
      |  CAST(${fdSql("SUM(prio)", "COUNT(*)")} AS BIGINT)
      |    AS mean_prio
      |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val docs = Tables.documents(s, d)
    def feats(parity: Int) = Checkpoints.pin(
      QualityClassifier.featurize(docs.filter(pmod(col("doc_id"),
          lit(2L)) === parity.toLong))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val fp = feats(1)
    val fh = feats(0)
    val wp = QualityClassifier.weights(QualityClassifier.trainCensus(fp))
      .select(col("w0").as("p0"), col("w1").as("p1"),
        col("w2").as("p2"), col("w3").as("p3"))
    val wh = QualityClassifier.weights(QualityClassifier.trainCensus(fh))
      .select(col("w0").as("h0"), col("w1").as("h1"),
        col("w2").as("h2"), col("w3").as("h3"))
    def sig(a: String, b: String, c: String, e: String) =
      s"least(1000000L, greatest(0L, (x0*$a + x1*$b + x2*$c + x3*$e" +
        " + 2000000) div 4))"
    fp.crossJoin(broadcast(wp)).crossJoin(broadcast(wh))
      .withColumn("prio",
        abs(expr(sig("p0", "p1", "p2", "p3")) - col("y") * 1000000L)
          - abs(expr(sig("h0", "h1", "h2", "h3"))
            - col("y") * 1000000L))
      .groupBy(fdCol(col("prio"), lit(100000L)).as("prio_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
        sum(col("prio")).as("sum_prio"),
        fdCol(sum(col("prio")), count(lit(1))).as("mean_prio"))
      .orderBy("prio_band")
  }

  // ---------------------------------------------------------------------
  // q335 — reliability diagram + expected calibration error
  // ---------------------------------------------------------------------

  /** q335 — RELIABILITY CENSUS + ECE (Naeini et al. 2015; Guo et al.
    * 2017) of the q303 classifier: per confidence decile, the mean
    * predicted probability vs the empirical positive rate, and the
    * expected calibration error ECE = Σ_b (n_b/N)·|conf_b − acc_b| —
    * the number that says whether the learned gate's scores can be
    * READ as probabilities (q304's mixture weights and q329's
    * knapsack both consume scores as if calibrated; this query is
    * that assumption's audit — the GD-model companion to q191's NB
    * calibration and q236's isotonic recalibration). All exact
    * integers: p̂ ∈ [0, 10⁶] under the final checkpoint, bands
    * ⌊p̂/10⁵⌋ clamped to 9, per-band means floored (nonneg — plain
    * floor div), ECE from the floored per-band gaps (stated).
    *
    * Scale: the q303 training passes + one scoring pass under the
    * broadcast 1-row w₃ + a ≤10-row keyed census. */
  val q335 = QueryDef(
    "q335_reliability_ece", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      gdPrefixSql + s""",
      |sc AS (
      |  SELECT f.y, $pred AS p FROM feat f CROSS JOIN w3 w),
      |nb AS (
      |  SELECT LEAST(p // 100000, 9) AS band,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS sp,
      |    CAST(SUM(y) AS BIGINT) AS sy
      |  FROM sc GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS nt,
      |    CAST(SUM(n * ABS(sp // n - (1000000 * sy) // n)) AS BIGINT)
      |      AS en
      |  FROM nb)
      |SELECT CAST(band AS BIGINT) AS conf_band, n AS n_docs,
      |  CAST(sp // n AS BIGINT) AS mean_conf_ppm,
      |  CAST((1000000 * sy) // n AS BIGINT) AS pos_rate_ppm,
      |  CAST(ABS(sp // n - (1000000 * sy) // n) AS BIGINT) AS gap_ppm,
      |  CAST(tot.en // tot.nt AS BIGINT) AS ece_ppm
      |FROM nb CROSS JOIN tot ORDER BY conf_band""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(QualityClassifier.trainCensus(feat))
    val nb = Checkpoints.pin(
      feat.crossJoin(broadcast(w3))
        .select(col("y"),
          expr("least(1000000L, greatest(0L," +
            " (x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4))")
            .as("p"))
        .groupBy(least(expr("p div 100000"), lit(9L)).as("band"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
          sum(col("y")).as("sy"))
        .localCheckpoint())
    val tot = nb.agg(sum(col("n")).as("nt"),
      sum(col("n") * abs(expr("sp div n - (1000000L * sy) div n")))
        .as("en"))
    nb.crossJoin(broadcast(tot))
      .select(col("band").as("conf_band"), col("n").as("n_docs"),
        expr("sp div n").as("mean_conf_ppm"),
        expr("(1000000L * sy) div n").as("pos_rate_ppm"),
        abs(expr("sp div n - (1000000L * sy) div n")).as("gap_ppm"),
        expr("en div nt").as("ece_ppm"))
      .orderBy("conf_band")
  }

  // ---------------------------------------------------------------------
  // q339 — black-box label-shift estimation (BBSE)
  // ---------------------------------------------------------------------

  /** q339 — BLACK-BOX LABEL-SHIFT estimation (Lipton, Wang & Smola
    * 2018, BBSE): estimate how the label prior moved between two
    * corpus slices using ONLY a classifier's hard predictions — the
    * confusion matrix on the source slice and the prediction
    * histogram on the target slice; no target labels touched. Under
    * label shift, C·w = μ̂ with C the source joint (ŷ, y) count
    * matrix and w_y = q(y)/p(y); for binary classes the inverse is
    * closed-form, so both weights are EXACT rationals on the count
    * grid: w_y = n_src·(adj · μ̂)_y / (n_tgt·det C), emitted in
    * sign-safe ppm (the estimator can go negative when the classifier
    * is near-uninformative — reported raw, stated, with the
    * determinant guard emitting nothing on det = 0). Slices: parity
    * split (source = even, target = odd); scorer: the q303 chain
    * trained on source only; ŷ = [z > 0] (the gate's rule). Both
    * halves of this synthetic corpus share the prior, so w ≈ 1 is
    * the honest-null reading — the gate pins the arithmetic.
    *
    * Scale: one GD chain on the source half + two linear scoring
    * passes + two bounded (≤4-row) censuses and a one-row closed-form
    * solve. Headroom: the 10⁶·ns·(c·m) numerator is cubic in the
    * slice size, which would wrap int64 already at ~2·10⁴ docs per
    * slice — so the ENTIRE solve rides the q312 wide-integer hatch:
    * the cofactor products (det = c00·c11 − c01·c10, the c·m
    * numerator terms) and the det ≠ 0 guard are cast to
    * DECIMAL(38,0)/HUGEINT BEFORE multiplying (round-11 ADVICE: an
    * int64 cofactor would wrap silently in Spark at n² ≈ 9.2·10¹⁸,
    * i.e. ~3·10⁹ docs, capping the headroom below the documented
    * bound), making the whole ratio exact to ~5·10¹⁰ docs per slice
    * (10⁶·n³ < 10³⁸). Only the one-row closed-form solve is wide;
    * every census stays int64. */
  val q339 = QueryDef(
    "q339_bbse_label_shift", {
      def pred(w: String) = "CASE WHEN f.x0*" + w + ".w0 + f.x1*" + w +
        ".w1 + f.x2*" + w + ".w2 + f.x3*" + w + ".w3 > 0" +
        " THEN 1 ELSE 0 END"
      s"""WITH ${chainSql("_s", "doc_id % 2 = 0")},
      |cm AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN ${pred("w")} = 0 AND f.y = 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c00,
      |    CAST(SUM(CASE WHEN ${pred("w")} = 0 AND f.y = 1 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c01,
      |    CAST(SUM(CASE WHEN ${pred("w")} = 1 AND f.y = 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c10,
      |    CAST(SUM(CASE WHEN ${pred("w")} = 1 AND f.y = 1 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c11,
      |    CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM feat_s f CROSS JOIN w3_s w),
      |tg AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
      |    CAST(10 AS BIGINT) AS x0,
      |    CAST(len(string_split(text, ' ')) - 50 AS BIGINT) AS x1,
      |    CAST((100 * n_chars) // len(string_split(text, ' ')) - 550
      |      AS BIGINT) AS x2,
      |    CAST(10 * len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'and'))) - 30 AS BIGINT) AS x3
      |  FROM documents WHERE doc_id % 2 = 1),
      |mu AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN ${pred("w")} = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m0,
      |    CAST(SUM(CASE WHEN ${pred("w")} = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m1,
      |    CAST(COUNT(*) AS BIGINT) AS nt
      |  FROM tg f CROSS JOIN w3_s w),
      |sv AS (
      |  SELECT cm.ns, mu.nt, cm.c00, cm.c01, cm.c10, cm.c11,
      |    mu.m0, mu.m1,
      |    CAST(cm.c00 AS HUGEINT) * cm.c11
      |      - CAST(cm.c01 AS HUGEINT) * cm.c10 AS det,
      |    CAST(cm.c11 AS HUGEINT) * mu.m0
      |      - CAST(cm.c01 AS HUGEINT) * mu.m1 AS a0,
      |    CAST(cm.c00 AS HUGEINT) * mu.m1
      |      - CAST(cm.c10 AS HUGEINT) * mu.m0 AS a1
      |  FROM cm CROSS JOIN mu)
      |SELECT ns AS n_src, nt AS n_tgt, c00, c01, c10, c11, m0, m1,
      |  CAST(${fdSql(
        "CAST(CASE WHEN det < 0 THEN -1000000 ELSE 1000000 END" +
          " AS HUGEINT) * ns * a0",
        "CAST(nt AS HUGEINT) * ABS(det)")}
      |    AS BIGINT) AS w0_ppm,
      |  CAST(${fdSql(
        "CAST(CASE WHEN det < 0 THEN -1000000 ELSE 1000000 END" +
          " AS HUGEINT) * ns * a1",
        "CAST(nt AS HUGEINT) * ABS(det)")}
      |    AS BIGINT) AS w1_ppm
      |FROM sv WHERE det <> 0""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val docs = Tables.documents(s, d)
    val fs = Checkpoints.pin(
      QualityClassifier.featurize(docs.filter(pmod(col("doc_id"),
          lit(2L)) === 0L))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val ft = Checkpoints.pin(
      QualityClassifier.featurize(docs.filter(pmod(col("doc_id"),
          lit(2L)) === 1L))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(QualityClassifier.trainCensus(fs))
    val yhat = expr(
      "case when x0*w0 + x1*w1 + x2*w2 + x3*w3 > 0 then 1L else 0L end")
    val cm = fs.crossJoin(broadcast(w3))
      .agg(
        sum(when(yhat === 0L && col("y") === 0L, 1L).otherwise(0L))
          .as("c00"),
        sum(when(yhat === 0L && col("y") === 1L, 1L).otherwise(0L))
          .as("c01"),
        sum(when(yhat === 1L && col("y") === 0L, 1L).otherwise(0L))
          .as("c10"),
        sum(when(yhat === 1L && col("y") === 1L, 1L).otherwise(0L))
          .as("c11"),
        count(lit(1)).as("ns"))
    val mu = ft.crossJoin(broadcast(w3))
      .agg(sum(when(yhat === 0L, 1L).otherwise(0L)).as("m0"),
        sum(when(yhat === 1L, 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("nt"))
    // Wide cofactors BEFORE the products (round-11 ADVICE): det and
    // the adj·μ̂ terms ride DECIMAL(38,0) from the first multiply, so
    // nothing in the solve ever touches int64 beyond the raw counts.
    cm.crossJoin(broadcast(mu))
      .withColumn("det",
        expr("CAST(c00 AS DECIMAL(38,0)) * c11" +
          " - CAST(c01 AS DECIMAL(38,0)) * c10"))
      .withColumn("a0",
        expr("CAST(c11 AS DECIMAL(38,0)) * m0" +
          " - CAST(c01 AS DECIMAL(38,0)) * m1"))
      .withColumn("a1",
        expr("CAST(c00 AS DECIMAL(38,0)) * m1" +
          " - CAST(c10 AS DECIMAL(38,0)) * m0"))
      .filter(col("det") =!= 0)
      .select(col("ns").as("n_src"), col("nt").as("n_tgt"),
        col("c00"), col("c01"), col("c10"), col("c11"),
        col("m0"), col("m1"),
        fdCol(
          expr("CAST(CASE WHEN det < 0" +
            " THEN -1000000L ELSE 1000000L END AS DECIMAL(38,0))" +
            " * ns * a0"),
          expr("CAST(nt AS DECIMAL(38,0)) * ABS(det)"))
          .cast("long").as("w0_ppm"),
        fdCol(
          expr("CAST(CASE WHEN det < 0" +
            " THEN -1000000L ELSE 1000000L END AS DECIMAL(38,0))" +
            " * ns * a1"),
          expr("CAST(nt AS DECIMAL(38,0)) * ABS(det)"))
          .cast("long").as("w1_ppm"))
  }

  // ---------------------------------------------------------------------
  // q340 — selective-classification risk–coverage curve
  // ---------------------------------------------------------------------

  /** q340 — RISK–COVERAGE curve for selective classification
    * (El-Yaniv & Wiener 2010; Geifman & El-Yaniv 2017): if the
    * curation pipeline only acts on documents the q303 gate is
    * CONFIDENT about (the standard selective-prediction deployment),
    * what error rate does each coverage level buy? Confidence =
    * margin |p̂ − ½| banded to ten 50k-ppm rungs; descending the
    * ladder from most- to least-confident accumulates coverage and
    * error, giving the exact risk–coverage staircase: per band,
    * marginal docs/errors and cumulative coverage_ppm / risk_ppm
    * (floored — stated). The curve is the operating manual for the
    * gate: q335 says whether scores are calibrated, this says what
    * abstention buys even when they are not. Error = [ŷ ≠ y] with
    * ŷ = [p̂ ≥ ½] (ties to positive, stated).
    *
    * Scale: the q303 chain + one scoring pass + a ≤10-row margin
    * census with prefix windows on it. */
  val q340 = QueryDef(
    "q340_risk_coverage", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      gdPrefixSql + s""",
      |sc AS (
      |  SELECT f.y, $pred AS p FROM feat f CROSS JOIN w3 w),
      |er AS (
      |  SELECT ABS(p - 500000) // 50000 AS mband,
      |    CASE WHEN (CASE WHEN p >= 500000 THEN 1 ELSE 0 END) <> y
      |      THEN 1 ELSE 0 END AS err
      |  FROM sc),
      |nb AS (
      |  SELECT CAST(mband AS BIGINT) AS mband,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(err) AS BIGINT) AS e
      |  FROM er GROUP BY 1),
      |cv AS (
      |  SELECT mband, n, e,
      |    CAST(SUM(n) OVER (ORDER BY mband DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
      |    CAST(SUM(e) OVER (ORDER BY mband DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce,
      |    CAST(SUM(n) OVER () AS BIGINT) AS nt
      |  FROM nb)
      |SELECT mband AS margin_band, n AS n_docs, e AS n_errors,
      |  CAST((1000000 * cn) // nt AS BIGINT) AS coverage_ppm,
      |  CAST((1000000 * ce) // cn AS BIGINT) AS risk_ppm
      |FROM cv ORDER BY margin_band DESC""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(QualityClassifier.trainCensus(feat))
    val nb = Checkpoints.pin(
      feat.crossJoin(broadcast(w3))
        .select(col("y"),
          expr("least(1000000L, greatest(0L," +
            " (x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4))")
            .as("p"))
        .select(expr("abs(p - 500000L) div 50000").as("mband"),
          when(when(col("p") >= 500000L, 1L).otherwise(0L)
            =!= col("y"), 1L).otherwise(0L).as("err"))
        .groupBy(col("mband"))
        .agg(count(lit(1)).as("n"), sum(col("err")).as("e"))
        .localCheckpoint())
    // prefix windows ride the ≤10-row margin census — PlanSpec
    // window-allowlisted
    val wd = Window.orderBy(col("mband").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.orderBy(col("mband").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nb.withColumn("cn", sum(col("n")).over(wd))
      .withColumn("ce", sum(col("e")).over(wd))
      .withColumn("nt", sum(col("n")).over(wa))
      .select(col("mband").as("margin_band"), col("n").as("n_docs"),
        col("e").as("n_errors"),
        expr("(1000000L * cn) div nt").as("coverage_ppm"),
        expr("(1000000L * ce) div cn").as("risk_ppm"))
      .orderBy(col("margin_band").desc)
  }

  // ---------------------------------------------------------------------
  // q341 — Brier score decomposition (reliability/resolution/uncertainty)
  // ---------------------------------------------------------------------

  /** q341 — BRIER SCORE DECOMPOSITION (Murphy 1973): the quadratic
    * score of the q303 gate split into its three classical parts over
    * the confidence-decile partition —
    *   Brier = REL − RES + UNC,
    *   REL = Σ n_b(conf_b − acc_b)²/N  (calibration deficit — what
    *         q335's ECE reads in L1),
    *   RES = Σ n_b(acc_b − base)²/N    (how much the score SEPARATES
    *         outcomes — the part ECE cannot see),
    *   UNC = base(1 − base)            (the label's own entropy
    *         floor).
    * The identity binds for the BINNED forecaster (predictions
    * replaced by their bin means — Murphy's construction), so the
    * census emits BOTH quadratic scores: brier_ppm2 (raw) and
    * brier_binned_ppm2 = Σ n_b[(conf_b−acc_b)² + acc_b(10⁶−acc_b)]/N;
    * decomposition_gap_ppm2 = binned − (REL − RES + UNC) is pure
    * flooring residual (spec-pinned tiny), while binning_loss_ppm2 =
    * raw − binned is the real within-bin variance/covariance term —
    * REPORTED, not hidden. All exact ppm² int64. A scorer can have
    * zero ECE and zero resolution (constant base-rate prediction);
    * this query is the audit that catches it.
    *
    * Scale: the q303 training passes + one scoring pass + a ≤10-row
    * keyed census and one-row folds. Headroom: Σ(p−10⁶y)² ≤ N·10¹²
    * wraps int64 past N ≈ 9·10⁶ (documented; DECIMAL beyond).
    * Empty-corpus symmetry: dd is a global agg (no GROUP BY) and the
    * final select guards n > 0 in BOTH engines, so an empty corpus
    * emits zero rows everywhere (the q332/q343 convention). */
  val q341 = QueryDef(
    "q341_brier_decomposition", {
      val pred = "LEAST(1000000, GREATEST(0, " +
        "(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 + 2000000) // 4))"
      gdPrefixSql + s""",
      |sc AS (
      |  SELECT f.y, $pred AS p FROM feat f CROSS JOIN w3 w),
      |tt AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM((p - 1000000 * y) * (p - 1000000 * y)) AS BIGINT)
      |      AS sbr,
      |    CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) AS base
      |  FROM sc),
      |nb AS (
      |  SELECT LEAST(p // 100000, 9) AS band,
      |    CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(p) AS BIGINT) AS sp,
      |    CAST(SUM(y) AS BIGINT) AS sy
      |  FROM sc GROUP BY 1),
      |dd AS (
      |  SELECT
      |    CAST(SUM(nb * (sp // nb - (1000000 * sy) // nb)
      |      * (sp // nb - (1000000 * sy) // nb)) AS BIGINT) AS reln,
      |    CAST(SUM(nb * ((1000000 * sy) // nb - tt.base)
      |      * ((1000000 * sy) // nb - tt.base)) AS BIGINT) AS resn,
      |    CAST(SUM(nb * ((sp // nb - (1000000 * sy) // nb)
      |        * (sp // nb - (1000000 * sy) // nb)
      |      + ((1000000 * sy) // nb)
      |        * (1000000 - (1000000 * sy) // nb))) AS BIGINT) AS bbin
      |  FROM nb CROSS JOIN tt)
      |SELECT tt.n AS n_docs, CAST(tt.sbr // tt.n AS BIGINT)
      |    AS brier_ppm2,
      |  CAST(dd.bbin // tt.n AS BIGINT) AS brier_binned_ppm2,
      |  CAST(dd.reln // tt.n AS BIGINT) AS rel_ppm2,
      |  CAST(dd.resn // tt.n AS BIGINT) AS res_ppm2,
      |  CAST(tt.base * (1000000 - tt.base) AS BIGINT) AS unc_ppm2,
      |  CAST(dd.bbin // tt.n
      |    - (dd.reln // tt.n - dd.resn // tt.n
      |       + tt.base * (1000000 - tt.base)) AS BIGINT)
      |    AS decomposition_gap_ppm2,
      |  CAST(tt.sbr // tt.n - dd.bbin // tt.n AS BIGINT)
      |    AS binning_loss_ppm2
      |FROM tt CROSS JOIN dd WHERE tt.n > 0""".stripMargin
    }) { (s, d) =>
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val w3 = QualityClassifier.weights(QualityClassifier.trainCensus(feat))
    val sc = Checkpoints.pin(
      feat.crossJoin(broadcast(w3))
        .select(col("y"),
          expr("least(1000000L, greatest(0L," +
            " (x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4))")
            .as("p"))
        .localCheckpoint())
    val tt = sc.agg(count(lit(1)).as("n"),
      sum(expr("(p - 1000000L * y) * (p - 1000000L * y)")).as("sbr"),
      expr("(1000000L * sum(y)) div count(1)").as("base"))
    val nb = sc.groupBy(least(expr("p div 100000"), lit(9L)).as("band"))
      .agg(count(lit(1)).as("nb"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
    val dd = nb.crossJoin(broadcast(tt))
      .agg(
        sum(expr("nb * (sp div nb - (1000000L * sy) div nb)" +
          " * (sp div nb - (1000000L * sy) div nb)")).as("reln"),
        sum(expr("nb * ((1000000L * sy) div nb - base)" +
          " * ((1000000L * sy) div nb - base)")).as("resn"),
        sum(expr("nb * ((sp div nb - (1000000L * sy) div nb)" +
          " * (sp div nb - (1000000L * sy) div nb)" +
          " + ((1000000L * sy) div nb)" +
          " * (1000000L - (1000000L * sy) div nb))")).as("bbin"))
    tt.crossJoin(broadcast(dd))
      .filter(col("n") > 0)
      .select(col("n").as("n_docs"),
        expr("sbr div n").as("brier_ppm2"),
        expr("bbin div n").as("brier_binned_ppm2"),
        expr("reln div n").as("rel_ppm2"),
        expr("resn div n").as("res_ppm2"),
        expr("base * (1000000L - base)").as("unc_ppm2"),
        expr("bbin div n - (reln div n - resn div n" +
          " + base * (1000000L - base))").as("decomposition_gap_ppm2"),
        expr("sbr div n - bbin div n").as("binning_loss_ppm2"))
  }

  // ---------------------------------------------------------------------
  // q343 — Kish design effect of post-stratification weights
  // ---------------------------------------------------------------------

  /** q343 — KISH DESIGN EFFECT (Kish 1965) of balancing the corpus to
    * UNIFORM sources: the weighting that q320 (IPF), q315 (UniMax)
    * and q304 (DoReMi) all imply has a price — weighted estimates
    * lose effective sample size by deff = n·Σn_c w_c² / (Σn_c w_c)².
    * Weights here are the post-stratification-to-uniform family
    * w_c = N/(|S|·n_c) on the MILLI grid (floored — stated; the
    * coarser grid buys int64 headroom: S₁ ≈ 10³·N, so S₁² wraps past
    * N ≈ 3·10⁶ docs — documented, DECIMAL beyond). Output: corpus
    * and cell counts, weight range, deff in milli, and the Kish
    * effective sample size n_eff = ⌊10³·n/deff⌋ — the single number
    * that says what a balanced read of this corpus is WORTH in
    * unweighted-doc units (q312's ESS prices a sampling temperature;
    * this prices a balancing weight).
    *
    * Scale: one (source) keyed count + |S|-row folds — nothing else
    * grows. */
  val q343 = QueryDef(
    "q343_kish_deff",
    """WITH sc AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nc
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(nc) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS s FROM sc),
      |wc AS (
      |  SELECT sc.nc,
      |    CAST((1000 * t.n) // (t.s * sc.nc) AS BIGINT) AS wm
      |  FROM sc CROSS JOIN t),
      |agg AS (
      |  SELECT CAST(SUM(nc * wm) AS BIGINT) AS s1,
      |    CAST(SUM(nc * wm * wm) AS BIGINT) AS s2,
      |    CAST(MIN(wm) AS BIGINT) AS wmin, CAST(MAX(wm) AS BIGINT)
      |      AS wmax
      |  FROM wc)
      |SELECT t.n AS n_docs, t.s AS n_cells, a.wmin AS w_min_milli,
      |  a.wmax AS w_max_milli,
      |  CAST((1000 * t.n * a.s2) // (a.s1 * a.s1) AS BIGINT)
      |    AS deff_milli,
      |  CAST((1000 * t.n) //
      |    GREATEST(1, (1000 * t.n * a.s2) // (a.s1 * a.s1))
      |    AS BIGINT) AS n_eff
      |FROM t CROSS JOIN agg a WHERE t.n > 0""".stripMargin) { (s, d) =>
    import graft.functions.Checkpoints
    val sc = Checkpoints.pin(
      Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("nc"))
        .localCheckpoint())
    val t = sc.agg(sum(col("nc")).as("n"), count(lit(1)).as("s"))
    val agg = sc.crossJoin(broadcast(t))
      .select(col("nc"),
        expr("(1000L * n) div (s * nc)").as("wm"))
      .agg(sum(expr("nc * wm")).as("s1"),
        sum(expr("nc * wm * wm")).as("s2"),
        min(col("wm")).as("wmin"), max(col("wm")).as("wmax"))
    t.crossJoin(broadcast(agg))
      .filter(col("n") > 0)
      .select(col("n").as("n_docs"), col("s").as("n_cells"),
        col("wmin").as("w_min_milli"), col("wmax").as("w_max_milli"),
        expr("(1000L * n * s2) div (s1 * s1)").as("deff_milli"),
        expr("(1000L * n) div" +
          " greatest(1L, (1000L * n * s2) div (s1 * s1))").as("n_eff"))
  }

  // ---------------------------------------------------------------------
  // q347 — EL2N data-diet pruning census
  // ---------------------------------------------------------------------

  /** q347 — EL2N "DATA DIET" pruning census (Paul, Ganguli & Dziugaite
    * 2021): can an EARLY checkpoint's per-example error norm predict
    * which documents the FINAL model still gets wrong — i.e. which
    * examples a curation pass could prune without losing the hard
    * cases? For the q303 linear scorer the per-example EL2N is exactly
    * |err| = |σ̂_ppm(z) − 10⁶y| (ppm grid), so the score needs no new
    * machinery: err at step 2 (the first INFORMED checkpoint — step 1
    * runs under all-zero weights, where every |err| is the constant
    * 5·10⁵ and the census would be degenerate, stated) is banded by
    * its margin past the decision boundary, band = min(⌊max(|err| −
    * 5·10⁵, 0)/2000⌋, 9) (the GREATEST(·,0) keeps the dividend
    * non-negative, where DuckDB's floor `//` and Spark's truncating
    * `div` agree), and each band reports its FINAL-checkpoint
    * misclassification count (mis = err₃ ≥ 5·10⁵ ∨ err₃ ≤ −(5·10⁵+1),
    * the ≥-tie convention of q340, stated) plus the descending
    * cumulative ladder: keep_frac_ppm (corpus kept if everything from
    * this band up is retained) and err_coverage_ppm (share of final
    * errors that kept set contains). The data-diet claim is the shape
    * of that ladder — high-EL2N bands carry nearly all the final
    * errors at a small keep fraction.
    *
    * Scale: the q303 chain + one ≤10-row band census; the cumulative
    * windows ride the census (PlanSpec-allowlisted bounded window).
    * Empty-corpus symmetry: global aggs + n > 0 guard in both engines
    * (the q341 convention). */
  val q347 = QueryDef(
    "q347_el2n_pruning",
    gdPrefixSql + s""",
    |el AS (
    |  SELECT doc_id,
    |    LEAST(GREATEST(ABS(err) - 500000, 0) // 2000, 9) AS band
    |  FROM e2),
    |fin AS (
    |  SELECT doc_id,
    |    CASE WHEN err >= 500000 OR err <= -500001 THEN 1 ELSE 0 END
    |      AS mis
    |  FROM e3),
    |bb AS (
    |  SELECT CAST(el.band AS BIGINT) AS band,
    |    CAST(COUNT(*) AS BIGINT) AS n,
    |    CAST(SUM(fin.mis) AS BIGINT) AS mis
    |  FROM el JOIN fin ON fin.doc_id = el.doc_id GROUP BY 1),
    |cv AS (
    |  SELECT band, n, mis,
    |    CAST(SUM(n) OVER (ORDER BY band DESC
    |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
    |    CAST(SUM(mis) OVER (ORDER BY band DESC
    |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cmis,
    |    CAST(SUM(n) OVER () AS BIGINT) AS nt,
    |    CAST(SUM(mis) OVER () AS BIGINT) AS mt
    |  FROM bb)
    |SELECT band AS el2n_band, n AS n_docs, mis AS n_mis_final,
    |  CAST(1000000 * mis // n AS BIGINT) AS mis_rate_ppm,
    |  CAST(1000000 * cn // nt AS BIGINT) AS keep_frac_ppm,
    |  CAST(CASE WHEN mt = 0 THEN 1000000
    |    ELSE 1000000 * cmis // mt END AS BIGINT) AS err_coverage_ppm
    |FROM cv WHERE nt > 0 ORDER BY el2n_band DESC""".stripMargin) {
    (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Checkpoints
    import graft.ml.QualityClassifier
    val feat = Checkpoints.pin(
      QualityClassifier.featurize(Tables.documents(s, d))
        .select("doc_id", "y", "x0", "x1", "x2", "x3").localCheckpoint())
    val errs = Checkpoints.pin(
      QualityClassifier.stepErrors(feat).toDF().localCheckpoint())
    val el = errs.filter(col("step") === 2L)
      .select(col("doc_id"),
        least(expr("greatest(abs(err) - 500000L, 0L) div 2000"),
          lit(9L)).as("band"))
    val fin = errs.filter(col("step") === 3L)
      .select(col("doc_id"),
        when(col("err") >= 500000L || col("err") <= -500001L, 1L)
          .otherwise(0L).as("mis"))
    val bb = el.join(fin, "doc_id")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("mis")).as("mis"))
    val wd = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bb.withColumn("cn", sum(col("n")).over(wd))
      .withColumn("cmis", sum(col("mis")).over(wd))
      .withColumn("nt", sum(col("n")).over(wa))
      .withColumn("mt", sum(col("mis")).over(wa))
      .filter(col("nt") > 0)
      .select(col("band").as("el2n_band"), col("n").as("n_docs"),
        col("mis").as("n_mis_final"),
        expr("1000000L * mis div n").as("mis_rate_ppm"),
        expr("1000000L * cn div nt").as("keep_frac_ppm"),
        when(col("mt") === 0, 1000000L)
          .otherwise(expr("1000000L * cmis div mt"))
          .as("err_coverage_ppm"))
      .orderBy(col("el2n_band").desc)
  }

  /** q359 — COHEN'S KAPPA inter-gate agreement census (Cohen 1960;
    * the QA read a curation stack does before composing two quality
    * gates: raw agreement is inflated by marginal prevalence — two
    * gates that both pass 90% of docs "agree" 82% by chance alone —
    * kappa is the chance-corrected number): two declared heuristic
    * gates over every document — A: n_chars ≥ 280 (the length gate),
    * B: centi-mean-token-length ≥ 560 (the q303-featurizer word-
    * length signal) — censused per source as the 2×2 confusion plus
    *   κ = (n·agree − (a₁b₁ + a₀b₀)) / (n² − (a₁b₁ + a₀b₀))
    * in exact ppm (the closed form of (p_o − p_e)/(1 − p_e) over a
    * common denominator n² — all int64, headroom n ≤ 3·10⁶ per
    * source before n²·10⁶ nears the int64 edge; shard the census
    * key beyond that). The numerator is sign-valid (κ < 0 = worse
    * than chance), so the division is the sign-safe pmod floor form;
    * a source where both gates are constant and identical has
    * p_e = 1 → κ undefined → NULL in both engines (stated).
    *
    * Scale: one map-side projection per doc + one |sources|-group
    * census — no joins, no windows, nothing grows beyond the scan. */
  val q359 = QueryDef(
    "q359_kappa_agreement",
    s"""WITH g AS (
      |  SELECT source,
      |    CASE WHEN n_chars >= 280 THEN 1 ELSE 0 END AS ga,
      |    CASE WHEN (100 * n_chars) //
      |      len(string_split(text, ' ')) >= 560 THEN 1 ELSE 0 END AS gb
      |  FROM documents),
      |c AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(ga) AS BIGINT) AS a_pos,
      |    CAST(SUM(gb) AS BIGINT) AS b_pos,
      |    CAST(SUM(CASE WHEN ga = gb THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_agree
      |  FROM g GROUP BY 1),
      |k AS (
      |  SELECT source, n_docs, a_pos, b_pos, n_agree,
      |    a_pos * b_pos + (n_docs - a_pos) * (n_docs - b_pos) AS pn
      |  FROM c)
      |SELECT source, n_docs, a_pos, b_pos, n_agree,
      |  CASE WHEN n_docs * n_docs = pn THEN NULL
      |    ELSE ${fdSql("1000000 * (n_docs * n_agree - pn)",
             "n_docs * n_docs - pn")} END AS kappa_ppm
      |FROM k ORDER BY source""".stripMargin) { (s, d) =>
    val g = Tables.documents(s, d).select(col("source"),
      when(col("n_chars") >= 280, 1L).otherwise(0L).as("ga"),
      when(expr("(100 * n_chars) div size(split(text, ' '))") >= 560,
        1L).otherwise(0L).as("gb"))
    g.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ga")).as("a_pos"),
        sum(col("gb")).as("b_pos"),
        sum(when(col("ga") === col("gb"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("pn", col("a_pos") * col("b_pos") +
        (col("n_docs") - col("a_pos")) * (col("n_docs") - col("b_pos")))
      .select(col("source"), col("n_docs"), col("a_pos"), col("b_pos"),
        col("n_agree"),
        when(col("n_docs") * col("n_docs") === col("pn"),
          lit(null).cast("long"))
          .otherwise(fdCol(
            lit(1000000L) * (col("n_docs") * col("n_agree") - col("pn")),
            col("n_docs") * col("n_docs") - col("pn"))).as("kappa_ppm"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] =
    Seq(q303, q304, q306, q308, q312, q313, q313b, q314, q315, q317,
      q318, q319, q320, q321, q323, q324, q328, q329, q330, q332,
      q333, q335, q339, q340, q341, q343, q347, q359)
}
