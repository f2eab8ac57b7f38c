// In org.apache.spark.sql.graft (not graft.*) because the bloom
// aggregate/predicate expressions and the classic Column<->Expression
// bridge are private[sql]: this is Catalyst-internal-facing code, kept
// in one place like DotProduct/TextKernels/LshJoin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._

/** Bloom-filtered join: the explicit, caller-controlled form of Spark's
  * own `InjectRuntimeFilter` optimization (which only fires for shuffle
  * joins under conf thresholds and can't be pinned from the API).
  *
  * Shape: ONE aggregate pass over the (already filtered) dim side folds
  * every join key into a bloom bitset via `BloomFilterAggregate`; the
  * bitset — a few hundred KB, bounded by `numBits` regardless of data
  * scale — comes back to the driver as a single binary cell and is
  * re-shipped as a literal inside a `BloomFilterMightContain` filter on
  * the fact side. The fact scan then drops most non-matching rows
  * BEFORE the join shuffle: at 100 TB the shuffle write is the cost
  * that dominates a fact-dim join, and a selective dim turns e.g. an
  * 80 % non-matching fact into an 80 % smaller exchange. False
  * positives (rate set by numBits/expectedItems) pass the bloom and are
  * removed by the real join, so the result is EXACTLY the plain join —
  * q111 states that equivalence as its oracle.
  *
  * The driver-side reduction here is the bloom bitset itself — the same
  * bounded object Spark's optimizer ships through a subquery broadcast —
  * and is documented like the other bounded collects (Ranks boundaries,
  * Recommender histogram).
  */
object GraftBloom {

  /** Aggregate column: serialized bloom filter over `xxhash64(key)`.
    * `BloomFilterAggregate` requires a LongType child — hashing the key
    * is exactly what `InjectRuntimeFilter` does (`XxHash64(expr)`). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        ExpressionUtils.expression(xxhash64(key)),
        ExpressionUtils.expression(lit(expectedItems)),
        ExpressionUtils.expression(lit(numBits))).toAggregateExpression())

  /** Predicate: bloom membership of `xxhash64(key)` in a driver-held
    * bitset (shipped to executors as a foldable binary literal). */
  def mightContain(bloomBits: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(lit(bloomBits)),
      ExpressionUtils.expression(xxhash64(key))))

  /** Build the bloom bitset of `dim`'s `dimKey` values. Empty dim →
    * None (the aggregate yields NULL with nothing folded in). */
  def buildBloom(
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      numBits: Long): Option[Array[Byte]] =
    Option(
      dim.agg(bloomAgg(col(dimKey), expectedItems, numBits))
        .head().getAs[Array[Byte]](0))

  /** Inner equi-join of `fact` to `dim`, with the fact side pre-screened
    * by a bloom over the dim keys. Row-identical to
    * `fact.join(dim, factKey === dimKey)` by construction. */
  def bloomFilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1L << 17,
      numBits: Long = 1L << 21): DataFrame = {
    val joined = (f: DataFrame) =>
      f.join(dim, f(factKey) === dim(dimKey))
    buildBloom(dim, dimKey, expectedItems, numBits) match {
      case Some(bits) => joined(fact.filter(mightContain(bits, col(factKey))))
      case None       => joined(fact.filter(lit(false))) // empty dim
    }
  }
}
