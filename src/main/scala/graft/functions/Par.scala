package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Scale-adaptive fan-out width for explicit keyed repartitions.
  *
  * Several operators repartition by key immediately before a row
  * blowup (per-position explode) or a heavyweight per-row kernel
  * (media decode in mapPartitions) so the expensive projection runs
  * at full width instead of on the scan's few input splits. Those
  * sites used a literal 32 — correct for the local[32] bench, wrong
  * everywhere else: at a lower local core count it over-partitions,
  * and on a real cluster it caps a 100-TB decode at 32 tasks.
  *
  * [[fanout]] uses the session's configured shuffle parallelism
  * (`spark.sql.shuffle.partitions`) instead: the bench/verify mains
  * set it to the harness core count (so local behavior at 32 cores is
  * bit-identical to the old literal), and on a cluster it is the
  * admin's already-sized shuffle width. Keyed repartition is
  * deterministic (hash of the key), so partition placement — and
  * therefore results — never depends on the width.
  */
object Par {
  /** The session's shuffle parallelism — the width every other
    * exchange in the plan already gets. */
  def fanout(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  implicit class FanoutOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** `ds.repartition(<session shuffle width>, cols…)` — the
      * scale-adaptive spelling of `repartition(32, cols…)`. */
    def fanoutBy(cols: Column*): Dataset[T] =
      ds.repartition(
        ds.sparkSession.sessionState.conf.numShufflePartitions, cols: _*)
  }
}
