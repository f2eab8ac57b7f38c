// Lives in org.apache.spark.sql.graft for access to Dataset.ofRows,
// LogicalRDD and the Catalyst partitioning/ordering types a
// partitioning-preserving checkpoint needs.
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

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
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "PartitionedCheckpoint.byKey needs keys")
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val n = spark.sessionState.conf.numShufflePartitions
    val keyCols = keys.map(df.col)
    val rp = df.repartition(n, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
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
}
