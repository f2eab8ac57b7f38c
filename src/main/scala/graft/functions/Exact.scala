package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric aggregation.
  *
  * Floating-point sums are order-dependent; a distributed Spark sum and a
  * single-threaded oracle scan accumulate in different orders and disagree
  * in the low bits. Accumulating in exact decimal and casting the final
  * value to double makes the result bit-identical regardless of partition
  * count — this is also the right call at 100 TB where partial aggregation
  * order is nondeterministic across retries.
  *
  * The source money-like columns carry at most 2 decimal digits
  * (reference keeps money as double throughout, see SURVEY §1.2), so
  * DECIMAL(28,s) is lossless for them — and the 28-digit precision
  * leaves ~10 orders of magnitude of headroom at 100 TB: 10^12 rows of
  * 10^4-magnitude values sum to ~10^16, where DECIMAL(18,2)'s ±10^16
  * ceiling would overflow to null (or throw under ANSI). Spark widens
  * sum-of-decimal accumulators internally, so the wider type costs
  * nothing on the per-row path.
  */
object Exact {
  /** Exact sum of a (≤ `scale`-digit) double column, returned as double. */
  def sumD(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact-sum-based average: same double division on both engines. */
  def avgD(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(28, scale))).cast("double") / count(c))

  /** Exact sum of a product of two ≤2-digit decimals (scale 4). */
  def sumProdD(a: Column, b: Column): Column =
    sum((a.cast(DecimalType(28, 2)) * b.cast(DecimalType(28, 2))))
      .cast("double")
}
