package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank as pure DataFrame algebra — the iterative
  * link-analysis companion to [[Components]] (same join-per-round
  * shape; rounds are a CONSTANT here, not the graph diameter).
  *
  * Cross-engine float discipline: a rank update sums one double per
  * in-neighbor, and floating-point addition is order-dependent, so a
  * naive implementation diverges from any reference by accumulation
  * order. Each contribution is therefore snapped to integer
  * pico-units (`floor(r/d · 1e12 + 0.5)`) and summed as LONG — exact,
  * order-independent, map-side combinable — before one double
  * multiply per node (the q56 centroid trick applied to graph
  * iteration). DuckDB running the identical formula reproduces every
  * iteration bit-for-bit (q82).
  *
  * Precondition: every node referenced by `dst` also appears as a
  * `src` (true for any symmetrized graph, e.g. co-occurrence);
  * dangling-node mass redistribution is deliberately out of scope.
  *
  * Scale: per iteration, one shuffle for the contribution groupBy and
  * one keyed left join — both on the node key, so AQE handles skewed
  * hubs like any aggregation. Rank state is |V| rows; edges stream
  * through without materializing per-node adjacency lists.
  */
object PageRank {

  /** `teleport` defaults to `1 - damping` — the pair must sum to 1 or
    * rank mass is not conserved; pass both only if you know why.
    *
    * `seeds`: optional (node, w) frame for PERSONALIZED PageRank
    * (Haveliwala 2002): the teleport mass lands on the seed
    * distribution instead of uniformly — ranks become "importance as
    * seen from the seed set" (topic-sensitive ranking, trusted-page
    * propagation, related-item scoring from a context set). Weights
    * must sum to 1; nodes absent from `seeds` get teleport 0. The
    * initial rank IS the seed distribution, matching the standard PPR
    * formulation. The seed frame joins on the node key (broadcast
    * when small) — no new shuffle shape.
    *
    * Seed nodes MUST be source nodes of `edges` (the same
    * src-coverage precondition as above, applied to seeds): the node
    * universe is derived from `src`, so weight on a node outside it
    * is silently dropped and the teleport mass sums below the seed
    * total — conservation breaks without an error. Derive seeds from
    * the edge frame's sources (as q189 does) or pre-filter them. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, damping: Double = 0.85,
          teleport: Double = Double.NaN,
          seeds: Option[DataFrame] = None): DataFrame = {
    val tp = if (teleport.isNaN) 1.0 - damping else teleport
    // One materialization: e feeds deg, n, and every iteration — an
    // unpersisted plan would recompute the caller's edge derivation
    // 2+iterations times (the Ranks/Components reuse lesson). The pin
    // DECLARES src-hash partitioning (round-12 phase 3,
    // PartitionedCheckpoint): deg (groupBy src) and the e-side of
    // every iteration's contribution join then plan with no exchange
    // and no re-sort — the checkpointed stats are unknown, so Spark
    // plans those joins as SortMergeJoin and a plain localCheckpoint
    // re-exchanged |E| rows per iteration (q82's before-plan: 12 SMJ,
    // 0 broadcast). A caller that already built the edge frame with
    // PartitionedCheckpoint.byKey on the source column (q82/q189's
    // fused distinct-pair build) is detected and used as-is — the
    // rename to src/dst is alias-preserving projection, no second
    // materialization.
    val e = {
      import org.apache.spark.sql.graft.PartitionedCheckpoint
      val sel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      if (PartitionedCheckpoint.declaredKeys(edges) == Seq(srcCol)) sel
      else graft.functions.Checkpoints.pin(
        PartitionedCheckpoint.byKey(sel, Seq("src")))
    }
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val n = deg.agg(count(lit(1)).as("cnt"))
    val seedW = seeds.map(sw => graft.functions.Checkpoints.pin(
      sw.select(col("node"), col("w")).localCheckpoint(true)))
    // teleport landing per node: tp·w(node) personalized, tp/|V| not
    def teleportTerm(frame: DataFrame): DataFrame = seedW match {
      case Some(sw) => frame.join(broadcast(sw), Seq("node"), "left")
        .withColumn("__tp", lit(tp) * coalesce(col("w"), lit(0.0)))
        .drop("w")
      case None => frame.crossJoin(broadcast(n))
        .withColumn("__tp", lit(tp) / col("cnt")).drop("cnt")
    }
    var r = seedW match {
      case Some(sw) => deg.select(col("src").as("node"))
        .join(broadcast(sw), Seq("node"), "left")
        .select(col("node"), coalesce(col("w"), lit(0.0)).as("r"))
      case None => deg.crossJoin(broadcast(n))
        .select(col("src").as("node"), (lit(1.0) / col("cnt")).as("r"))
    }
    // the live checkpointed rank frame, freed when superseded (the
    // Components discipline) — long runs would otherwise hold every
    // stale |V|-row snapshot in executor storage
    var lastCkpt: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contrib = e
        .join(r, e("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          floor(col("r") / col("d") * lit(1e12) + lit(0.5))
            .cast("long").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = teleportTerm(r.select(col("node"))
        .join(contrib, Seq("node"), "left"))
        .select(col("node"),
          (col("__tp") +
            lit(damping) * (coalesce(col("s"), lit(0L)) / lit(1e12)))
            .as("r"))
      // Truncate the rank frame's lineage every 3 rounds (the
      // Components discipline, amortized): each round references r
      // TWICE (contrib join + carry-forward), so an unbounded plan
      // doubles per iteration — but a depth-3 segment is only ~8
      // copies, and checkpointing every round would pay one extra
      // eager job per iteration (measured +0.8s on q82's 2 rounds).
      // State is |V| rows per checkpoint.
      if (i < iterations && i % 3 == 0) {
        // eager checkpoint first (it reads the old blocks), THEN free
        // the superseded snapshot
        val ck = graft.functions.Checkpoints.pin(r.localCheckpoint(true))
        lastCkpt.foreach(graft.functions.Checkpoints.free(_))
        lastCkpt = Some(ck)
        r = ck
      }
    }
    r
  }
}
