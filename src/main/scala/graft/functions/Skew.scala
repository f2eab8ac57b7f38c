package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at scale.
  *
  * ADJUDICATION vs Spark 4's built-ins (measured in ExtensionsSpec's
  * `adjudication:` cases — task-level shuffle bytes on a 200k-row hot
  * key, recorded in the spec output):
  *
  *  - JOIN skew: AQE's OptimizeSkewedJoin splits the hot partition
  *    natively (plan shows `skew=true`; wall time ≈ the manual salt's).
  *    [[saltedJoin]] remains for paths AQE cannot touch: shuffle-free
  *    SMJ over bucketed/co-partitioned inputs (no exchange to split),
  *    joins whose output must keep hash partitioning for a downstream
  *    consumer, AQE-off deployments, and PROACTIVE routing where the
  *    skew profile is known ahead of runtime stats (q157's
  *    sketch-driven split).
  *  - Algebraic aggregation (sum/count/min/max): map-side partial
  *    aggregation already collapses a hot key to one row per map
  *    partition — measured 3.6KB crossing the exchange for a 2.4MB hot
  *    key. [[saltedSumCount]] is belt-and-braces on modern Spark; keep
  *    it for engines/paths without partial aggregation.
  *  - Rank-limit windows (top-K per key): Spark 4's WindowGroupLimit
  *    (SPARK-37099) prunes each map partition to K rows per key BEFORE
  *    the exchange — the classic manual-salt territory (q76's salted
  *    top-K) is also handled natively now.
  *  - Large-state aggregation (collect_list-class, where the partial
  *    state IS the data): neither AQE nor salting fixes the FINAL
  *    landing — the whole per-key payload inherently converges on one
  *    task. Two-phase salting bounds phase one's sort/buffer (measured
  *    224KB vs 862KB max-task). At scale, restructure the consumer
  *    (partitioned writes, windowed chunks) instead of materializing
  *    hot lists.
  *
  * The two-phase shape: salt the key → partial aggregate on
  * (key, salt) → final aggregate on key. Works for any algebraic
  * aggregate; distinct-style aggregates need the sketch route
  * (`approx_count_distinct`) instead.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from arbitrary
    * distributor columns (NOT rand(): retries/speculative tasks must
    * re-derive the same salt or partial aggregates double-count). */
  def salt(buckets: Int, distributors: Column*): Column =
    pmod(hash(distributors: _*), lit(buckets))

  /** Two-phase salted sum/count aggregation: returns
    * `key, sum_<col>, cnt` with the hot key's work spread over
    * `buckets` reducers in phase one. Default distributors are ALL
    * input columns, not the value column alone — a hot key whose rows
    * share one constant value would hash to a single salt bucket and
    * get zero mitigation (pass a high-cardinality column like an
    * event id explicitly when you have one). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     buckets: Int, distributors: Column*): DataFrame = {
    val dist = if (distributors.nonEmpty) distributors
               else df.columns.toSeq.map(col)
    df.withColumn("__salt", salt(buckets, dist: _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join for a skewed BIG side that must meet a small-
    * but-not-broadcastable right side: the big side's rows are spread
    * over `buckets` sub-keys by deterministic distributor columns,
    * and the right side is replicated once per bucket, so a hot join
    * key fans out over `buckets` reducers instead of one straggler
    * task. Inner join only (replication would duplicate unmatched
    * right rows under outer semantics). Result == `big.join(right,
    * bigKey === rightKey)` row-for-row — q105 pins the equivalence
    * against a plain-join oracle.
    *
    * Distributors default to all big-side columns (the saltedSumCount
    * caveat applies: pass a unique id column when one exists). Choose
    * `buckets` ~ the hot key's row count / target partition size;
    * replication multiplies right-side shuffle volume by `buckets`,
    * which is the explicit price of de-skewing. */
  def saltedJoin(big: DataFrame, right: DataFrame, bigKey: String,
                 rightKey: String, buckets: Int,
                 distributors: Column*): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val reserved = Seq("__salt")
    require(!(big.columns ++ right.columns).exists(reserved.contains),
      "__salt is reserved by saltedJoin")
    val dist = if (distributors.nonEmpty) distributors
               else big.columns.toSeq.map(col)
    val saltedBig = big.withColumn("__salt", salt(buckets, dist: _*))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(rightKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
