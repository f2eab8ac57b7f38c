package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded k-core peeling (Seidman 1983; the distributed peeling form
  * of Batagelj–Zaveršnik): repeatedly delete nodes of degree < k until
  * none remain. The k-core is the standard "dense cohesive backbone"
  * extraction a graph pipeline runs before community or influence
  * analysis — and the peeling loop is exactly the shape that
  * distributes: one keyed degree agg + two semi-joins per round, no
  * global state.
  *
  * This variant runs a FIXED round budget and emits a per-round census
  * instead of claiming a fixpoint: round r's row describes the graph
  * after r peels, so convergence (two equal consecutive rows) or
  * non-convergence within the budget is readable from the output — the
  * contract an oracle can replay exactly (the q82 fixed-iteration
  * discipline; a while-until-stable loop would make the round count
  * data-dependent and the mirrored SQL unwritable).
  *
  * Scale: per-round cost is one map-side-combinable degree agg over
  * the surviving edges plus two hash semi-joins keyed on the node id;
  * lineage is truncated per round (eager localCheckpoint, freed via
  * [[Checkpoints]] — the Components discipline). Rounds needed in
  * practice track how gradually the degree distribution crosses k
  * (sf0.01 co-purchase support-graph: 11), not graph size.
  */
object KCore {

  /** Per-round census of `rounds` peeling steps at threshold `k` over
    * a DIRECTED edge frame (pass a symmetric edge set for undirected
    * semantics — degree here is out-degree). Returns one row per
    * round r in 0..rounds: (round, n_nodes, n_edges, min_deg,
    * max_deg), where round 0 describes the input graph. Empty
    * survivor graphs census as all-zero rows on both engines. */
  def peelCensus(edges: DataFrame, srcCol: String, dstCol: String,
                 k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got $k/$rounds")
    // every round's frame is pinned WITH declared src partitioning
    // (round-12 phase 3): the degree census (groupBy src) and the
    // src-side survivor semi-join then plan exchange-free every
    // round — the dst-side join is the only per-round shuffle left
    def pinSrc(f: DataFrame): DataFrame = Checkpoints.pin(
      org.apache.spark.sql.graft.PartitionedCheckpoint.byKey(
        f, Seq("src")))
    var e = pinSrc(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    def census(deg: DataFrame, r: Int): DataFrame =
      deg.agg(count(lit(1)).as("n_nodes"),
          coalesce(sum(col("d")), lit(0L)).as("n_edges"),
          coalesce(min(col("d")), lit(0L)).as("min_deg"),
          coalesce(max(col("d")), lit(0L)).as("max_deg"))
        .select(lit(r.toLong).as("round"), col("n_nodes"),
          col("n_edges"), col("min_deg"), col("max_deg"))
    val rows = Seq.newBuilder[DataFrame]
    for (r <- 0 to rounds) {
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      // eager one-row checkpoint: the census must be MATERIALIZED
      // before this round's edge frame is freed below, or the final
      // union replays it against released checkpoint blocks.
      // The census and the next-round edge build are INDEPENDENT
      // given this round's frame, so they run overlapped on driver
      // threads (guide §2.6; the q344/q350 ladder treatment) — the
      // per-round wall time drops to the larger of the two jobs
      // instead of their sum, across `rounds` sequential rounds.
      if (r < rounds) {
        val keep = deg.filter(col("d") >= k).select(col("src").as("n"))
        val eCur = e
        val both = Concurrent.inParallel(edges.sparkSession, Seq(
          () => Checkpoints.pin(census(deg, r).localCheckpoint()),
          () => pinSrc(
            eCur.join(keep, eCur("src") === keep("n")).drop("n")
              .join(keep, eCur("dst") === keep("n")).drop("n")
              .select(col("src"), col("dst")))))
        rows += both(0)
        Checkpoints.free(e)
        e = both(1)
      } else {
        rows += Checkpoints.pin(census(deg, r).localCheckpoint())
      }
    }
    rows.result().reduce(_ unionByName _).orderBy(col("round"))
  }

  /** The matching DuckDB oracle text: `rounds` generated CTE blocks
    * replaying [[peelCensus]] over a base edge CTE named `e0` (which
    * the caller supplies with columns src, dst). */
  def peelCensusSql(k: Int, rounds: Int): String = {
    val blocks = (0 to rounds).map { r =>
      val d = s"d$r AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS d " +
        s"FROM e$r GROUP BY 1)"
      val c = s"c$r AS (SELECT CAST($r AS BIGINT) AS round, " +
        s"CAST(COUNT(*) AS BIGINT) AS n_nodes, " +
        s"CAST(COALESCE(SUM(d), 0) AS BIGINT) AS n_edges, " +
        s"CAST(COALESCE(MIN(d), 0) AS BIGINT) AS min_deg, " +
        s"CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_deg FROM d$r)"
      val next =
        if (r < rounds)
          Seq(s"k$r AS (SELECT src AS n FROM d$r WHERE d >= $k)",
            s"e${r + 1} AS MATERIALIZED (SELECT e$r.src, e$r.dst FROM e$r " +
              s"JOIN k$r ka ON e$r.src = ka.n " +
              s"JOIN k$r kb ON e$r.dst = kb.n)")
        else Seq.empty
      (Seq(d, c) ++ next).mkString(",\n")
    }.mkString(",\n")
    val sel = (0 to rounds).map(r => s"SELECT * FROM c$r")
      .mkString("\nUNION ALL ")
    s"$blocks\n$sel\nORDER BY round"
  }
}
