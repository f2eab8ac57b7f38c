package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-range (interval) join: all (left, right) pairs with equal
  * keys and `right.ts ∈ [left.ts + lower, left.ts + upper)`.
  *
  * Spark plans a raw inequality join as a broadcast-nested-loop the
  * moment the equi-side estimate is poor — O(|L|·|R|) at scale. The
  * scalable shape is bucket-and-filter: time-bucket both sides with
  * bucket width = the window span, explode each left row to the (at
  * most two) consecutive buckets its window can touch, equi-join on
  * (keys, bucket) — a plain shuffle hash join — and apply the exact
  * range predicate last. Row amplification is ≤2× on the left side,
  * bounded by construction, regardless of data size; the join itself
  * is the same keyed shuffle every other join in the engine uses.
  *
  * Times are integer microseconds (`unix_micros`) so the bucket
  * arithmetic is exact; `lower < upper` required. Right columns are
  * returned under `rightPrefix` to avoid collisions.
  */
object Intervals {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTsUs: String, rightTsUs: String,
                lowerUs: Long, upperUs: Long,
                rightPrefix: String = "r_"): DataFrame = {
    require(lowerUs < upperUs, "rangeJoin: need lowerUs < upperUs")
    // The implementation claims __lo/__hi/__hi1/__rb as working columns
    // and maps right columns into the rightPrefix namespace; a caller
    // column with one of those names would be silently overwritten (or
    // collide ambiguously) and corrupt the join — fail instead, the
    // same contract asofJoin enforces (AsOf.scala).
    val reserved = Seq("__lo", "__hi", "__hi1", "__rb")
    val clashes = (left.columns ++ right.columns).distinct
      .filter(reserved.contains)
    require(clashes.isEmpty,
      s"rangeJoin: column names $clashes are reserved internals; " +
        "rename them before the join")
    val prefixed = right.columns.map(rightPrefix + _).toSet
    val prefixClashes = left.columns.filter(prefixed.contains)
    require(prefixClashes.isEmpty,
      s"rangeJoin: left columns ${prefixClashes.toSeq} collide with " +
        s"prefixed right columns; pick a different rightPrefix")
    val w = upperUs - lowerUs // bucket width = span ⇒ ≤2 buckets touched
    // Floor-division in PURE LONG arithmetic: `x - pmod(x, w)` is the
    // exact floor multiple, then integer `div`. Column `/` promotes
    // to double, whose floor goes off by one once |x| reaches 2^53 —
    // a silently dropped join pair, the worst failure mode.
    def floorDiv(colName: String): String =
      s"(`$colName` - pmod(`$colName`, ${w}L)) div ${w}L"
    val r = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rightPrefix + c))
      .withColumn("__rb", expr(floorDiv(rightPrefix + rightTsUs)))
    val l = left.withColumn("__lo", col(leftTsUs) + lowerUs)
      .withColumn("__hi1", col(leftTsUs) + upperUs - 1)
      // window [lo, hi) touches buckets floor(lo/w) .. floor((hi-1)/w)
      .withColumn("__rb", explode(sequence(
        expr(floorDiv("__lo")), expr(floorDiv("__hi1")))))
      .withColumn("__hi", col(leftTsUs) + upperUs)
      .drop("__hi1")
    val on = keys.map(k => l(k) === r(rightPrefix + k))
      .reduce(_ && _) && l("__rb") === r("__rb") &&
      r(rightPrefix + rightTsUs) >= l("__lo") &&
      r(rightPrefix + rightTsUs) < l("__hi")
    l.join(r, on, "inner").drop("__lo", "__hi").drop(l("__rb"))
      .drop(r("__rb"))
  }
}
