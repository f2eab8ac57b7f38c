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

  /** Cross-engine HALF_UP rounding of a double quotient to 2 places.
    *
    * `round(x, 2)` is NOT engine-portable when the true quotient sits
    * exactly on a half (e.g. 82/80 = 1.025): Spark rounds the SHORTEST
    * DECIMAL REPR of the double ("1.025" → 1.03) while DuckDB rounds
    * the exact binary value (1.02499999999999991… → 1.02). This form —
    * floor(x·100 + 0.5)/100 — is the same IEEE multiply/add/floor/
    * divide sequence on both engines, so results are bit-identical.
    * Oracle-side equivalent: `CAST(FLOOR(x*100 + 0.5) AS BIGINT)/100.0`.
    * Halves round toward +∞ on BOTH engines — HALF_UP for x ≥ 0, and
    * for negative x a half like -1.025 rounds to -1.02 (not -1.03).
    * Cross-engine equality holds for any sign because the oracle runs
    * the identical FLOOR formula; only the "HALF_UP" label would be
    * wrong for negatives (r2 ADVICE item; pinned by ExactSpec). */
  def round2(c: Column): Column = roundP(c, 2)

  /** [[round2]] generalized to `p` places: floor(x·10^p + 0.5)/10^p.
    * Oracle equivalent: `CAST(FLOOR(x*1e<p> + 0.5) AS BIGINT)/1e<p>`. */
  def roundP(c: Column, p: Int): Column = {
    val m = math.pow(10, p)
    floor(c * m + lit(0.5)).cast("double") / m
  }
}
