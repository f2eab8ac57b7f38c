package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-analytic helpers with pinned deterministic semantics
  * (SURVEY §2.4 A3/A7/A12 ⚠ rows).
  */
object Analytics {

  /** A3: most-frequent value of `valueCol` per `keys`, tie-break = smallest
    * value (pandas `mode().iloc[0]` sorts ascending —
    * `gold_pipeline.py:205-215`).
    *
    * Two-level aggregation instead of a window sort: the first groupBy
    * shuffles on (key, value) with map-side partial counts; `max_by` then
    * reduces per key. No per-key global sort, so a hot key at 100 TB costs
    * one combine, not a skewed sort. Count ties resolve to the smallest
    * value via the (cnt, reversed-value) struct ordering trick — for the
    * struct max, higher cnt wins, then lexicographically *smaller* value
    * must win, so we order by a descending rank of the value within the
    * struct using a second groupBy-free construction: max_by with
    * row_number is avoided; instead min over values restricted to max cnt.
    */
  def modeDeterministic(df: DataFrame, keys: Seq[String], valueCol: String,
                        as: String): DataFrame = {
    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
    counted
      .withColumn("__max", max(col("__cnt")).over(w))
      .filter(col("__cnt") === col("__max"))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as(as))
  }

  /** A12: pandas `rank(pct=True)` (average-rank / count; differs from
    * SQL `percent_rank`) lives in [[Ranks.pctRankPandas]] — distributed,
    * no global window. */

  /** A7: quartile tier via ntile over a fully deterministic order.
    * `pd.qcut` buckets by quantile value (ties share a bucket); engine
    * semantics are pinned to ntile with a unique tie-break column, per
    * SURVEY §2.4 A7. Delegates to [[Ranks.ntileGlobal]]: the old
    * `ntile(4).over(Window.orderBy(...))` sorted the whole frame in one
    * task, which grows with the catalog (r2 verdict What's-wrong #4).
    */
  def quartileTier(df: DataFrame, score: Column, tieBreak: Column,
                   as: String,
                   labels: Seq[String] = Seq("Low", "Medium", "High", "Top"))
  : DataFrame = {
    val tiled = Ranks.ntileGlobal(df, labels.size, score, tieBreak, "__tile")
    val label = labels.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (l, i)) => when(col("__tile") === i + 1, l).otherwise(acc)
    }
    tiled.withColumn(as, label).drop("__tile")
  }
}
