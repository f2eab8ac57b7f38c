package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Releasing `localCheckpoint()`ed frames correctly.
  *
  * `Dataset.unpersist()` does NOT free a local checkpoint: the
  * checkpoint is an RDD-level persist behind the returned Dataset's
  * `LogicalRDD`, invisible to the catalog cache manager that
  * `Dataset.unpersist()`/`spark.catalog.clearCache()` operate on.
  * Every iterative operator here (Components, PageRank, Bpe,
  * SuffixRanks) checkpoints per round to truncate lineage; without
  * this helper each round's corpus-sized snapshot stays in executor
  * storage until driver GC lets the ContextCleaner find it — the
  * storage-pressure failure mode a long bench run or a 100-TB
  * multi-query job hits first.
  */
object Checkpoints {

  /** Unpersist the RDD backing a checkpointed Dataset (falls back to
    * plain `unpersist()` for catalog-cached frames). After this, any
    * action on `df` FAILS — checkpointed plans have no lineage to
    * recompute — so call it only once the frame is truly dead. */
  def free(df: DataFrame, blocking: Boolean = false): Unit = {
    // If the frame was pinned, drop the registry's strong reference
    // too — otherwise a superseded-then-freed frame stays queued (a
    // driver-side leak for long-lived callers that never releaseAll).
    pinned.remove(df)
    // Collect EVERY LogicalRDD in the plan, not just a root match: an
    // operator may hand back a cheap projection OVER its checkpoint
    // (the SuffixRanks fused relabel) and freeing that frame must
    // still release the underlying blocks. OWNERSHIP CAVEAT: only
    // free frames whose whole plan you own — a frame that embeds
    // ANOTHER operator's live checkpoint would free that too.
    val rdds = df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr
    }
    if (rdds.nonEmpty) rdds.foreach(_.rdd.unpersist(blocking))
    else df.unpersist(blocking)
  }

  /** Checkpointed frames that must OUTLIVE the operator call that
    * built them (an operator's return value reads them lazily, so
    * there is no safe free point inside). The harness releases them
    * per query ([[releaseAll]] from Bench/Verify); long-lived callers
    * do the same after their final action.
    *
    * CONTRACT: the registry is process-wide and [[releaseAll]] frees
    * EVERY pinned frame regardless of which operator pinned it. It is
    * correct only under the sequential one-query-at-a-time harness
    * (Bench/Verify/tests). A caller interleaving two iterative
    * operators must instead [[free]] each operator's frames
    * individually once its results are materialized — never call
    * [[releaseAll]] while another operator's lazy result is live. */
  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register a checkpointed frame for end-of-query release; returns
    * it for chaining. See the registry contract above: pinned frames
    * belong to the whole process, not the pinning operator. */
  def pin(df: DataFrame): DataFrame = { pinned.add(df); df }

  /** Free every pinned checkpoint — from EVERY operator, see the
    * registry contract above. Frames derived from them fail on
    * later actions (release, not spill) — call only at a query
    * boundary. No-op when nothing is pinned; always safe. */
  def releaseAll(blocking: Boolean = true): Unit = {
    var f = pinned.poll()
    while (f != null) { free(f, blocking); f = pinned.poll() }
  }
}
