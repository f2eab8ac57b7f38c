package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every left row the single most
  * recent right row with the same key and an earlier (or equal) time.
  *
  * The classic need is feature engineering over event streams — "state
  * of X as of this event" (last purchase, last profile update, last
  * price). The reference computes such features imperatively per group
  * (`processing/streaming/feature_extraction.py` keeps last-seen state
  * per key); this is the batch form, and DuckDB's `ASOF JOIN` is the
  * oracle.
  *
  * Shape, chosen for 100-TB scale: a range join (`l.key = r.key AND
  * r.ts <= l.ts` + keep-latest) explodes to O(|matches|) intermediate
  * rows before pruning, and Spark plans the inequality as a
  * broadcast-nested-loop when the equi-side estimate is poor. Instead we
  * UNION the two sides (right rows carry a payload struct, left rows a
  * null) and run ONE window — partitioned by key, ordered by (time,
  * side-tag) — taking `last(payload, ignoreNulls=true)` over the
  * preceding frame. One shuffle on the key, one sort, zero row
  * amplification, and AQE handles a skewed key like any other window
  * aggregation.
  *
  * Strictness: with `strict=true` a right row at time == left time is
  * NOT visible (DuckDB `ON l.ts > r.ts`); ties between a left and right
  * row at the same instant are resolved by the side tag's sort position,
  * so the semantics are exact, not sort-luck. Right-side rows must be
  * unique per (key, time) — dedupe first (`keepLatest`) or the carried
  * payload is partition-order dependent.
  */
object AsOf {

  /** Left as-of join. `payload` columns are carried from the matched
    * right row (atomically — all from the SAME row, via one struct) and
    * appear in the output under their right-side names; left columns
    * pass through unchanged. `leftTs`/`rightTs` may be any orderable
    * type but must be mutually comparable (use the same type). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               strict: Boolean = true): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload columns required")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"asofJoin: payload ${payload.intersect(leftCols)} collide with left columns")
    // The implementation claims __t/__p/__tag/__m as working columns;
    // a caller column with one of those names would be silently
    // overwritten by withColumn and corrupt the result — fail instead.
    val reserved = Seq("__t", "__p", "__tag", "__m")
    val clashes =
      (leftCols ++ right.columns).distinct.filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofJoin: column names $clashes are reserved internals; " +
        "rename them before the join")
    // Side tag order decides same-instant visibility: for strict (>),
    // the left row must sort BEFORE a right row at the same time so its
    // preceding frame excludes it; for non-strict (>=), after.
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)
    // SQL join equality never matches a NULL key, but a window PARTITION
    // BY groups nulls together — drop null-key right rows so a null-key
    // left row gets a null payload (ASOF JOIN semantics), not a
    // same-partition accident.
    val rNonNull = right.filter(
      keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
    val r = rNonNull.select(
      (keys.map(col) :+ col(rightTs).as("__t")) :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__tag", lit(rightTag))
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .withColumn("__tag", lit(leftTag))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.toIndexedSeq.map(c =>
        if (r.columns.contains(c)) col(c) else lit(null).as(c)): _*))
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      // left rows only; right-only rows (tag side with null left cols)
      // are identified by their non-null payload column __p
      .filter(col("__p").isNull)
      .select(leftCols.map(col) ++
        payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
