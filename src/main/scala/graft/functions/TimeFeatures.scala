package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-derived feature expressions (SURVEY §2.2 P6–P10, P18).
  *
  * Reference: `processing/bronze-to-silver/main_pipeline.py:225-227`,
  * `transformations/clisckstream_transformer.py:53-57`,
  * `silver-to-gold/gold_pipeline.py:281-282`.
  *
  * All pure `Column` expressions — codegen'd, no UDFs, safe inside
  * whole-stage codegen at any scale.
  */
object TimeFeatures {
  /** P6: hour of day 0–23. */
  def hourOfDay(ts: Column): Column = hour(ts)

  /** P7: English day name ("Monday"…), matches pandas `dt.day_name()`. */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** P8: weekend flag. pandas uses Mon=0 ⇒ {5,6}=Sat,Sun; Spark's
    * `dayofweek` is Sun=1..Sat=7. Matching on the day *name* sidesteps
    * both numbering schemes (SURVEY §7 risk #1).
    */
  def isWeekend(ts: Column): Column =
    date_format(ts, "EEEE").isin("Saturday", "Sunday")

  /** P9 */
  def monthOf(ts: Column): Column = month(ts)
  def yearOf(ts: Column): Column  = year(ts)

  /** P10: calendar date for daily grouping. */
  def eventDate(ts: Column): Column = to_date(ts)

  /** P18: account age in days (reference `main_pipeline.py:297-300`).
    * Floor of ELAPSED days (pandas `(now - created).dt.days`), not
    * `datediff` — datediff counts calendar-day boundaries crossed, so
    * an account created at 23:59 would be "1 day old" two minutes
    * later. */
  def accountAgeDays(createdAt: Column): Column =
    floor((unix_timestamp(current_timestamp()) -
      unix_timestamp(createdAt)) / 86400).cast("int")

  /** Whole seconds since epoch (long). Truncation (not rounding) matches
    * a floor(epoch(ts)) oracle and is stable across sub-second precision
    * differences between engines.
    */
  def epochSeconds(ts: Column): Column = unix_timestamp(ts)
}
