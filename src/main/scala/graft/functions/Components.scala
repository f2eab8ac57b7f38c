package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative minimum-label
  * propagation — the clustering step that turns verified near-duplicate
  * PAIRS into duplicate GROUPS (keep one per group), the standard final
  * move of a MinHash/LSH dedup pipeline. The pairwise
  * drop-if-any-lower-similar rule (q42/q47/q50) under-merges chains
  * (A~B, B~C, A!~C); components give the transitive closure.
  *
  * Each iteration is one keyed join + one min-aggregation: every node
  * adopts the minimum label among itself and its neighbors. The
  * fixpoint (min node id per component) is unique, so the result is
  * deterministic and iteration-order independent; iterations needed =
  * graph diameter. The driver holds ONE scalar per iteration (the
  * changed-label count — convergence check), never row data.
  *
  * Scale note: plain propagation does O(diameter) rounds; duplicate
  * clusters are overwhelmingly tiny (pairs/triples — shingle overlap
  * decays fast), so the diameter is small in practice. For adversarial
  * long-chain graphs the two-phase large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce") halves the
  * diameter per round; same join primitive, same API.
  */
object Components {

  /** (id, component) for every node of the undirected edge set, where
    * `component` is the minimum node id reachable from `id`. Edges
    * need not be symmetric or dedup'd on input; null-endpoint edges
    * are dropped (a null node id is not a node), self-loops
    * contribute their node as a singleton. Both variants share this
    * contract — ComponentsSpec pins them against each other. */
  def connectedComponents(edges: DataFrame, srcCol: String,
                          dstCol: String, maxIter: Int = 20): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Iterative lineage MUST be truncated each round (localCheckpoint,
    // eager) or the nested union-join logical plan grows exponentially
    // with the iteration count — the standard discipline for iterative
    // Spark algorithms (MLlib ALS does the same via checkpointing).
    var labels = Checkpoints.pin(
      sym.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("component"))
        .localCheckpoint())
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // candidate labels: my own + each neighbor's current label
      val next = Checkpoints.pin(
        sym.join(labels, sym("b") === labels("id"))
          .select(sym("a").as("id"), col("component"))
          .union(labels)
          .groupBy(col("id"))
          .agg(min(col("component")).as("component"))
          .localCheckpoint())
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).count()
      Checkpoints.free(labels) // superseded snapshot: RDD-level free
      labels = next
      iter += 1
    }
    sym.unpersist()
    // Under-merged labels are WRONG answers, not slow ones — a graph
    // with diameter > maxIter must fail loudly, never return silently.
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter iterations " +
        s"($changed labels still changing); raise maxIter or use " +
        "connectedComponentsStar (O(log^2 n) rounds)")
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond"): the
    * adversarial-diameter variant. Where [[connectedComponents]] needs
    * O(diameter) rounds (a million-node chain = a million rounds),
    * star contraction converges in O(log² n) — each large-star round
    * re-points strictly-larger neighbors at the neighborhood minimum,
    * halving long paths; each small-star round flattens the rest into
    * stars. Same join-and-min primitive per round, lineage truncated
    * per round; the driver holds only the convergence scalar.
    *
    * Identical output contract to [[connectedComponents]] — (id,
    * component = min node id of the component) — pinned against it and
    * against an in-memory union-find by ComponentsSpec differentials. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
                              dstCol: String,
                              maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()

    // large-star: for every u, point each neighbor v > u at
    // m(u) = min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val m = sym.groupBy(col("a"))
        .agg(least(min(col("b")), first(col("a"))).as("m"))
      canon(sym.filter(col("b") > col("a"))
        .join(m, "a")
        .select(col("b").as("a"), col("m").as("b")))
    }

    // small-star: for every u, point each neighbor v ≤ u (and u
    // itself) at the minimum of that restricted neighborhood ∪ {u}
    def smallStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val restricted = sym.filter(col("b") <= col("a"))
      val m = restricted.groupBy(col("a"))
        .agg(least(min(col("b")), first(col("a"))).as("m"))
      canon(restricted.join(m, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(m.select(col("a"), col("m").as("b"))))
    }

    // allNodes from the RAW (null-filtered) edge set, BEFORE canon
    // strips self-loops — a node whose only edge is (n, n) must still
    // appear as a singleton, matching connectedComponents' contract.
    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val allNodes = Checkpoints.pin(raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id"))).distinct().localCheckpoint())
    var e = Checkpoints.pin(canon(raw).localCheckpoint())
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val next = Checkpoints.pin(smallStar(largeStar(e)).localCheckpoint())
      changed = next.exceptAll(e).count() + e.exceptAll(next).count()
      Checkpoints.free(e) // superseded snapshot: RDD-level free
      e = next
      iter += 1
    }
    require(changed == 0,
      s"connectedComponentsStar did not converge in $maxIter " +
        s"iterations ($changed edge changes in the last round)")
    // converged edge set is a union of stars centered at component
    // minima: label = min(neighbor ∪ self)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    allNodes
      .join(sym.groupBy(col("a").as("id2")).agg(min(col("b")).as("nmin")),
        col("id") === col("id2"), "left")
      .select(col("id"),
        least(coalesce(col("nmin"), col("id")), col("id")).as("component"))
  }
}
