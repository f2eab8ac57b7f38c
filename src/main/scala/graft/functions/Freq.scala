package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequent-items (heavy-hitter) summary — Misra–Gries 1982,
  * with the merge rule from Agarwal et al., "Mergeable Summaries"
  * (PODS 2012): at most `k` counters; an element's stored count
  * understates its true count by at most n/(k+1) after ANY merge tree.
  *
  * This is the sketch counterpart of q78's exact heavy-hitter profile:
  * the exact form shuffles the full keyspace; the sketch ships at most
  * `k` counters per partial, so a single-group aggregation over 100 TB
  * moves `partitions × k` longs instead of the keyspace. Spark runs it
  * as a typed imperative aggregate (ObjectHashAggregate): one summary
  * per partition, merged once — the buffer crosses the wire only at
  * the exchange, via Java serialization.
  *
  * Sizing contract (the q36/q90 exact-at-test-scale treatment): with
  * `k` above the distinct-key count no counter is ever evicted, every
  * stored count is EXACT and merge-order independent — that regime is
  * what the q121 oracle pins. Undersized, estimates are deterministic
  * lower bounds within n/(k+1) (FreqSpec pins the bound); production
  * sizes k by memory budget and accepts that ε.
  */
object Freq {

  /** The bounded counter map. `update` is the classic decrement-all
    * step; `mergeIn` adds counts then subtracts the (k+1)-th largest
    * and drops non-positives. */
  final class MGSummary(val k: Int) extends Serializable {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts: mutable.HashMap[Long, Long] = mutable.HashMap.empty

    def update(x: Long): Unit = counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None if counts.size < k => counts.update(x, 1L)
      case None => // full: decrement every counter, evict zeros
        val dead = mutable.ArrayBuffer.empty[Long]
        counts.keysIterator.foreach { key =>
          val c = counts(key) - 1
          if (c <= 0) dead += key else counts.update(key, c)
        }
        dead.foreach(counts.remove)
    }

    def mergeIn(o: MGSummary): Unit = {
      o.counts.foreach { case (key, c) =>
        counts.update(key, counts.getOrElse(key, 0L) + c)
      }
      if (counts.size > k) {
        // subtract the (k+1)-th largest count from everything
        val d = counts.values.toArray.sorted(Ordering.Long.reverse)(k)
        val dead = mutable.ArrayBuffer.empty[Long]
        counts.keysIterator.foreach { key =>
          val c = counts(key) - d
          if (c <= 0) dead += key else counts.update(key, c)
        }
        dead.foreach(counts.remove)
      }
    }
  }

  private class MGAgg(k: Int)
      extends Aggregator[Long, MGSummary, Map[Long, Long]] {
    def zero: MGSummary = new MGSummary(k)
    def reduce(b: MGSummary, a: Long): MGSummary = { b.update(a); b }
    def merge(a: MGSummary, b: MGSummary): MGSummary = { a.mergeIn(b); a }
    def finish(b: MGSummary): Map[Long, Long] = b.counts.toMap
    def bufferEncoder: org.apache.spark.sql.Encoder[MGSummary] =
      Encoders.javaSerialization[MGSummary]
    def outputEncoder: org.apache.spark.sql.Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
  }

  /** Heavy hitters of `key` (an integral column — string/float keys
    * should be hashed to a long first, e.g. via
    * [[graft.curation.Curation.contentU32]]) with stored count >=
    * `threshold`, as rows (`key`, `est`). One single-group aggregation
    * (partial summary per partition, one merge) + a bounded explode.
    * The null filter runs on the TRY_CAST key, so values that are
    * non-null but not long-castable are dropped rather than throwing
    * under ANSI mode or crashing the non-nullable aggregator input. */
  def heavyHitters(df: DataFrame, key: Column, k: Int,
                   threshold: Long): DataFrame = {
    val kl = key.try_cast("long")
    df.filter(kl.isNotNull)
      .agg(udaf(new MGAgg(k), Encoders.scalaLong)(kl).as("__summary"))
      .select(explode(col("__summary")).as(Seq("key", "est")))
      .filter(col("est") >= threshold)
  }
}
