package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.5 D1–D3).
  *
  * D1/D3 are hash-shuffle dedups on the key columns (Catalyst plans
  * `dropDuplicates` as a keyed aggregate with map-side partials). D2
  * must NOT use `dropDuplicates` — which row survives is partition-
  * dependent — so it pins the winner with a descending row_number
  * window (one shuffle on the key, skew handled by AQE).
  */
object Dedup {

  /** D1: dedup by a single id (`main_pipeline.py:254-255`). */
  def byKey(df: DataFrame, key: String): DataFrame =
    df.dropDuplicates(key)

  /** D3: composite-key dedup (`gold_pipeline.py:136-161`). */
  def byComposite(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** D2: keep the latest row per key, deterministically — ordered by
    * the timestamp column descending with `tieBreak` columns closing
    * any remaining ties (`main_pipeline.py:302-303,353-354`). */
  def keepLatest(df: DataFrame, key: String, tsCol: String,
                 tieBreak: Seq[String] = Nil): DataFrame =
    keepLatestBy(df, Seq(key),
      col(tsCol).desc +: tieBreak.map(col(_).desc))

  /** D2, general form: one surviving row per composite key, the winner
    * pinned by an explicit total ordering (callers must order on
    * columns that make the winner unique — an id tie-break — or the
    * survivor is partition-dependent, the exact failure dropDuplicates
    * has). One shuffle on the keys; skew handled by AQE. */
  def keepLatestBy(df: DataFrame, keys: Seq[String],
                   order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "keepLatestBy: column __rn is a reserved internal; rename it")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
