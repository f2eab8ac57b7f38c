package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental gold-aggregate maintenance (the hourly-refresh path of
  * SURVEY §2.4's gold tables — reference `gold_pipeline.py` recomputes
  * from scratch each run; at 100 TB a from-scratch gold rebuild per
  * hour is the single most expensive job in the pipeline, so the gold
  * state is kept as MERGEABLE partial aggregates instead):
  *
  *  - counts and sums are algebraic — merge = sum. Sums accumulate in
  *    DECIMAL(28,6) so merge order can never flip low bits.
  *  - distinct counts are NOT algebraic — the mergeable substitute is
  *    the DataSketches HLL sketch (`hll_sketch_agg` /
  *    `hll_union_agg`), whose union is exactly associative: merging
  *    {batch1}+{batch2} yields byte-identical state to one pass, so
  *    incremental and from-scratch reports agree exactly (pinned by
  *    IncrementalGoldSpec).
  *  - averages/rates are DERIVED in [[report]], never stored — the
  *    classic algebraic-decomposition rule (storing an avg makes it
  *    unmergeable).
  *
  * State is versioned (`v=N` subdirs): each run reads the latest
  * version, merges the new batch's partials (one groupBy shuffle on
  * user_id for the delta + one for the merge, both map-side combined),
  * and writes `v=N+1` — never overwriting what it read, so a crashed
  * run leaves the previous version intact (atomic-pointer-by-naming,
  * the same idempotence contract as Medallion.overwritePartitions).
  */
object IncrementalGold {

  private def dec6(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(28, 6))

  /** Mergeable per-user partial aggregate of one event batch. */
  def partials(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
      sum(dec6(coalesce(col("value"), lit(0.0)))).as("sum_value"),
      hll_sketch_agg(to_date(col("ts")).cast("string"))
        .as("days_sketch"))

  /** Merge previous state with a new batch's partials: sum the
    * algebraic columns, union the sketches. */
  def merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("user_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("n_purchases")).as("n_purchases"),
        sum(col("sum_value")).as("sum_value"),
        hll_union_agg(col("days_sketch")).as("days_sketch"))

  /** Derive the user-facing gold table from the mergeable state. */
  def report(state: DataFrame): DataFrame =
    state.select(
      col("user_id"),
      col("n_events"),
      col("n_purchases"),
      col("sum_value").cast("double").as("total_value"),
      graft.functions.Exact.round2(
        col("sum_value").cast("double") / col("n_events"))
        .as("avg_value"),
      hll_sketch_estimate(col("days_sketch")).as("approx_days_active"))

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def latestVersion(spark: SparkSession, stateDir: String): Int = {
    // Hadoop FileSystem, not java.io.File: state dirs live wherever
    // the tables do (HDFS/S3A in a deployment, local here). Only a
    // version carrying the committer's _SUCCESS marker counts — a
    // run that crashed mid-write leaves a v=N+1 dir with partial (or
    // zero) files, and reading it would either fail every subsequent
    // run or silently merge partial state forward.
    val (fs, p) = fsOf(spark, stateDir)
    // strict ^v=\d+$ match: a stray `v=5.bak` or `v=old` parked by an
    // operator must be SKIPPED, not allowed to poison every subsequent
    // run with a NumberFormatException
    val versioned = "^v=(\\d+)$".r
    if (!fs.exists(p)) -1
    else fs.listStatus(p).map(_.getPath)
      .flatMap(vp => vp.getName match {
        case versioned(n) if fs.exists(
          new org.apache.hadoop.fs.Path(vp, "_SUCCESS")) => Some(n.toInt)
        case _ => None
      })
      .foldLeft(-1)(math.max)
  }

  /** One incremental run: fold `newBatch` into the state under
    * `stateDir`, returning the new state version. A version left by a
    * crashed run (present but without `_SUCCESS`) is cleared and
    * rewritten — the previous committed version is never touched. */
  def run(spark: SparkSession, newBatch: DataFrame,
          stateDir: String): Int = {
    val delta = partials(newBatch)
    val v = latestVersion(spark, stateDir)
    val merged =
      if (v < 0) merge(delta.limit(0), delta)
      else merge(spark.read.parquet(s"$stateDir/v=$v"), delta)
    val (fs, _) = fsOf(spark, stateDir)
    val target = new org.apache.hadoop.fs.Path(s"$stateDir/v=${v + 1}")
    // an existing target here is by definition uncommitted (no
    // _SUCCESS, or latestVersion would have returned it) — retry heals
    if (fs.exists(target)) require(fs.delete(target, true),
      s"could not clear uncommitted $target")
    merged.write.mode("errorifexists").parquet(target.toString)
    v + 1
  }

  /** Read the current report (latest state version). */
  def currentReport(spark: SparkSession, stateDir: String): DataFrame = {
    val v = latestVersion(spark, stateDir)
    require(v >= 0, s"no state under $stateDir")
    report(spark.read.parquet(s"$stateDir/v=$v"))
  }
}
