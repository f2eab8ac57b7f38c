package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is
  * the explicit tool when one reduce key dominates an AGGREGATION
  * (AQE cannot split a single aggregation key). The two-phase shape:
  * salt the key → partial aggregate on (key, salt) → final aggregate
  * on key. Works for any algebraic aggregate (sum/count/min/max);
  * distinct-style aggregates need the sketch route
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
}
