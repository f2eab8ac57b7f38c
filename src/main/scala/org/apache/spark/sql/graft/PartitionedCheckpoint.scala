// Lives in org.apache.spark.sql.graft for access to Dataset.ofRows,
// LogicalRDD and the Catalyst partitioning/ordering types a
// partitioning-preserving checkpoint needs.
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Eager local checkpoint that KEEPS its hash partitioning and sort
  * order visible to the planner.
  *
  * `Dataset.localCheckpoint()` under AQE loses the child's output
  * partitioning (the adaptive plan's partitioning cannot be rewritten
  * onto the checkpointed LogicalRDD — measured in
  * graft.tools.CkptPartProbe: with AQE on, every keyed consumer of a
  * `repartition(k).localCheckpoint()` re-exchanges; with AQE off it
  * does not). This helper performs the repartition + in-partition
  * sort itself with an EXPLICIT partition count (AQE never rewrites
  * user-numbered repartitions), materializes the RDD eagerly, and
  * rebuilds the DataFrame over a LogicalRDD that declares
  * `HashPartitioning(keys, n)` + ascending key order — so a
  * downstream self-join, keyed aggregation or window partitioned by
  * the same keys plans with NO exchange and NO re-sort.
  *
  * SAFETY: the declared metadata must match the physical layout or
  * joins would be silently wrong. It does by construction — the rows
  * come from Spark's own hash exchange + in-partition sort for
  * exactly these keys and count — and the partition count is
  * re-checked against the materialized RDD (loud failure, never a
  * wrong plan). Checkpoint blocks are RDD-level persists: release via
  * [[graft.functions.Checkpoints.free]]/releaseAll exactly like
  * `localCheckpoint()` frames.
  */
object PartitionedCheckpoint {

  /** Repartition `df` by `keys` (session shuffle width), sort within
    * partitions by `keys`, eagerly local-checkpoint, and return a
    * frame whose plan DECLARES that partitioning + ordering. */
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame =
    byKeyWith(df, keys)(identity)

  /** [[byKey]] with a partitioning-preserving transform FUSED between
    * the keyed exchange and the materialization: `f` runs on the
    * already-repartitioned frame, so a dedup or keyed aggregation
    * whose grouping keys CONTAIN the partition keys plans with no
    * exchange of its own (HashPartitioning(keys) satisfies
    * ClusteredDistribution(keys ⊆ group cols)) — one shuffle where
    * the unfused `byKey(df.distinct(), keys)` shape pays two (the
    * dedup's own (all-cols) exchange, then the keyed one).
    *
    * SAFETY: the declared metadata is verified against the PHYSICAL
    * plan's own claims — after materialization, the executed plan's
    * `outputPartitioning` must be exactly HashPartitioning(keys, n)
    * (attribute-name match) — so a transform that secretly
    * re-exchanges or otherwise breaks the layout fails LOUDLY here
    * instead of producing wrong joins downstream. */
  def byKeyWith(df: DataFrame, keys: Seq[String])
               (f: DataFrame => DataFrame): DataFrame = {
    require(keys.nonEmpty, "PartitionedCheckpoint.byKey needs keys")
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val n = spark.sessionState.conf.numShufflePartitions
    val rp0 = f(df.repartition(n, keys.map(df.col): _*))
    val rp = rp0.sortWithinPartitions(keys.map(rp0.col): _*)
    val qe = rp.queryExecution
    // same materialization as Dataset.localCheckpoint(eager = true):
    // copy the reused UnsafeRows, mark for local checkpoint, run one
    // job to persist the blocks and truncate lineage
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    require(rdd.getNumPartitions == n,
      s"PartitionedCheckpoint: materialized ${rdd.getNumPartitions} " +
        s"partitions, declared $n — refusing to stamp wrong metadata")
    // Verify the finalized physical plan itself claims the declared
    // hash partitioning (AQE has finalized after the count above).
    val physical = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    physical.outputPartitioning match {
      case h: HashPartitioning
        if h.numPartitions == n &&
          h.expressions.length == keys.length &&
          h.expressions.zip(keys).forall {
            case (a: Attribute, k) => a.name == k
            case _ => false
          } => ()
      case other => throw new IllegalStateException(
        s"PartitionedCheckpoint: physical plan partitioning $other " +
          s"does not match declared HashPartitioning($keys, $n) — " +
          "the fused transform broke the layout; refusing to stamp")
    }
    val output = qe.analyzed.output
    val keyAttrs = keys.map { k =>
      output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"PartitionedCheckpoint: no output column $k"))
    }
    val plan = LogicalRDD(
      output, rdd,
      HashPartitioning(keyAttrs, n),
      keyAttrs.map(a => SortOrder(a, Ascending)),
      isStreaming = false)(spark)
    ClassicDataset.ofRows(spark, plan)
  }

  /** The key-column names a frame produced by [[byKey]]/[[byKeyWith]]
    * declares — Nil for anything else (including frames with a
    * projection on top). Lets a library operator (e.g. PageRank) skip
    * re-checkpointing an edge frame its caller already partitioned by
    * the right key. */
  def declaredKeys(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.outputPartitioning match {
        case h: HashPartitioning =>
          val names = h.expressions.collect { case a: Attribute => a.name }
          if (names.length == h.expressions.length) names else Nil
        case _ => Nil
      }
      case _ => Nil
    }
}
