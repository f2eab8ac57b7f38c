package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Checkpoints, LangModel}

/** DoReMi-shaped domain mixture reweighting (Xie et al. 2023) as an
  * exact-integer Spark operator: score each source domain's excess
  * loss under the current mixture (per-token KL(d ‖ mix) in
  * milli-nats, with exact unigram LMs standing in for the proxy
  * model), multiplicatively upweight the worst-served domains,
  * renormalize, repeat. The SAME arithmetic q304 gates against the
  * DuckDB oracle (TrainQueries.q304 is a thin wrapper over this
  * object); the curation lifecycle consumes the final α as sampling
  * weights ([[graft.curation.Curation.mixtureRates]]).
  *
  * Scale: the only growing intermediate is the (domain, token) count
  * table — |V|-bounded; each round is one broadcast of the |D|-row α
  * vector, one token-keyed agg (map-side combinable), one
  * domain-keyed agg. Rounds are fixed, not data-dependent. The census
  * and per-round α ride localCheckpoint + pin (α is read twice per
  * round, so without truncation round r's plan nests every earlier
  * round — measured 23 s at sf0.001 on pure plan replay, NOTES_r9);
  * callers release pins after their final action.
  */
object Mixture {

  /** Sign-safe pure-int64 floor division (see Intervals.floorDiv). */
  private def fdCol(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column) =
    call_function("div", a - pmod(a, b), b)

  /** Per-round mixture census over `docs` (needs `source`, `text`):
    * (r, source, alpha_ppm, excess_mnat), `rounds`·|D| rows. Round r:
    *   p_d(t)   = per-domain unigram prob, ppm (floor, clamped ≥ 1);
    *   p_mix(t) = Σ_d α_d·p_d(t) / 10⁶, ppm;
    *   excess_d = clamp₀ floor(Σ_t c_dt·[mnat p_d − mnat p_mix]/n_d);
    *   α_d     ← renorm(α_d·(10⁶ + η·excess_d)/10⁶), η = 10⁴. */
  def alphaRounds(docs: DataFrame, rounds: Int = 3): DataFrame = {
    import LangModel.mnat
    val dt = docs
      .select(col("source").as("d"),
        explode(split(col("text"), " ")).as("t"))
      .groupBy(col("d"), col("t")).agg(count(lit(1)).as("c"))
    val nd0 = dt.groupBy(col("d")).agg(sum(col("c")).as("n"))
    val nd = Checkpoints.pin(nd0.localCheckpoint())
    val pd = Checkpoints.pin(
      dt.join(nd, "d")
        .select(col("d"), col("t"), col("c"),
          greatest(lit(1L), expr("1000000L * c div n")).as("p_ppm"))
        .localCheckpoint())
    val nDom = nd.agg(count(lit(1)).as("nd_cnt"))
    var a: DataFrame = Checkpoints.pin(
      nd.crossJoin(broadcast(nDom))
        .select(col("d"), expr("1000000L div nd_cnt").as("a"))
        .localCheckpoint())
    val out = (1 to rounds).map { i =>
      val pm = pd.join(broadcast(a), "d")
        .groupBy(col("t"))
        .agg(greatest(lit(1L),
          expr("sum(a * p_ppm) div 1000000L")).as("pm_ppm"))
      val ex = pd.join(pm, "t").join(broadcast(nd), "d")
        .groupBy(col("d"))
        .agg(greatest(lit(0L), fdCol(
          sum(col("c") * (mnat(col("p_ppm")) - mnat(col("pm_ppm")))),
          max(col("n")))).as("e"))
      val up = a.join(ex, "d")
        .select(col("d"),
          expr("a * (1000000L + 10000L * e) div 1000000L").as("a_raw"),
          col("e"))
      val tot = up.agg(sum(col("a_raw")).as("tot"))
      val anew = Checkpoints.pin(
        up.crossJoin(broadcast(tot))
          .select(col("d"), expr("a_raw * 1000000L div tot").as("a"),
            col("e"))
          .localCheckpoint())
      a = anew.select(col("d"), col("a")) // drop e: next round re-joins
      anew.select(lit(i.toLong).as("r"), col("d").as("source"),
        col("a").as("alpha_ppm"), col("e").as("excess_mnat"))
    }
    out.reduce(_ unionByName _).orderBy("r", "source")
  }
}
