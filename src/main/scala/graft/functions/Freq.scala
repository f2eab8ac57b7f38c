package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequent-items (heavy-hitter) summary — Misra–Gries 1982,
  * with the merge rule from Agarwal et al., "Mergeable Summaries"
  * (PODS 2012): at most `k` counters; an element's stored count
  * understates its true count by at most n/(k+1) after ANY merge tree
  * (n = total items summarized).
  *
  * This is the sketch counterpart of q78's exact heavy-hitter profile:
  * the exact form shuffles the full keyspace; the sketch ships at most
  * `k` counters per partial, so a single-group aggregation over 100 TB
  * moves `partitions × k` longs instead of the keyspace. Spark runs it
  * as a typed imperative aggregate (ObjectHashAggregate): one summary
  * per partition, merged once — the buffer crosses the wire only at
  * the exchange, via Java serialization. The same aggregate runs under
  * `groupBy` for per-group profiles ([[heavyHittersBy]], q122) — state
  * is then `groups × k` counters, still independent of the keyspace.
  *
  * Sizing contract (the q36/q90 exact-at-test-scale treatment): with
  * `k` above the distinct-key count no counter is ever evicted, every
  * stored count is EXACT and merge-order independent — that regime is
  * what the q121/q122 oracles pin. Undersized, estimates are
  * deterministic lower bounds within n/(k+1) (FreqSpec pins the
  * bound); production sizes k by memory budget and accepts that ε.
  *
  * Threshold semantics: stored counts are LOWER bounds, so filtering
  * them at `threshold` can miss a true heavy hitter whose estimate was
  * decremented below it (false negatives up to n/(k+1) under the
  * cut). `guaranteedRecall = true` filters at
  * `threshold − ⌊n/(k+1)⌋` instead — the standard Misra–Gries query
  * rule: PROVIDED `threshold > n/(k+1)` (the sketch's resolution),
  * every key with true count ≥ threshold survives (no false
  * negatives), at the price of possible false positives in the same
  * band. Below the resolution no sketch of size k can promise recall —
  * a key that rare may have been evicted outright; size k so the
  * thresholds you query sit above n/(k+1). The default (false) keeps
  * the filter on the estimate itself — exact in the sized-capacity
  * regime. */
object Freq {

  /** The bounded counter map plus the total item count `n` (needed for
    * the n/(k+1) error bound at query time). `update` is the classic
    * decrement-all step; `mergeIn` adds counts then subtracts the
    * (k+1)-th largest and drops non-positives. */
  final class MGSummary(val k: Int) extends Serializable {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    var n: Long = 0L

    def update(x: Long): Unit = {
      n += 1
      counts.get(x) match {
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
    }

    def mergeIn(o: MGSummary): Unit = {
      n += o.n
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
      extends Aggregator[Long, MGSummary, (Map[Long, Long], Long)] {
    def zero: MGSummary = new MGSummary(k)
    def reduce(b: MGSummary, a: Long): MGSummary = { b.update(a); b }
    def merge(a: MGSummary, b: MGSummary): MGSummary = { a.mergeIn(b); a }
    def finish(b: MGSummary): (Map[Long, Long], Long) =
      (b.counts.toMap, b.n)
    def bufferEncoder: org.apache.spark.sql.Encoder[MGSummary] =
      Encoders.javaSerialization[MGSummary]
    def outputEncoder
        : org.apache.spark.sql.Encoder[(Map[Long, Long], Long)] =
      ExpressionEncoder[(Map[Long, Long], Long)]()
  }

  /** Shared core: one summary per group (or one global group), explode
    * to (group..., key, est) rows, apply the threshold rule. */
  private def summarize(df: DataFrame, group: Seq[Column], key: Column,
                        k: Int, threshold: Long,
                        guaranteedRecall: Boolean): DataFrame = {
    val kl = key.try_cast("long")
    val agged = df.filter(kl.isNotNull)
      .groupBy(group: _*)
      .agg(udaf(new MGAgg(k), Encoders.scalaLong)(kl).as("__s"))
    // integer cut: est and threshold are longs, so est >= t − n/(k+1)
    // (real-valued) is exactly est >= t − ⌊n/(k+1)⌋. The cut reads the
    // selected __n column (NOT __s._2, which the select below projects
    // away — filtering on it would lean on the analyzer's
    // missing-attribute resolution through the Project/Generate).
    val cut =
      if (guaranteedRecall)
        lit(threshold) - floor(col("__n") / (k + 1)).cast("long")
      else lit(threshold)
    val groupNames = agged.columns.dropRight(1).toSeq.map(col)
    agged
      .select(groupNames :+ col("__s._2").as("__n")
        :+ explode(col("__s._1")).as(Seq("key", "est")): _*)
      .filter(col("est") >= cut)
      .drop("__n")
  }

  /** Heavy hitters of `key` (an integral column — string/float keys
    * should be hashed to a long first, e.g. via
    * [[graft.curation.Curation.contentU32]]) as rows (`key`, `est`).
    * One single-group aggregation (partial summary per partition, one
    * merge) + a bounded explode. The null filter runs on the TRY_CAST
    * key, so values that are non-null but not long-castable are
    * dropped rather than throwing under ANSI mode or crashing the
    * non-nullable aggregator input. See the object doc for the
    * `threshold` / `guaranteedRecall` semantics. */
  def heavyHitters(df: DataFrame, key: Column, k: Int, threshold: Long,
                   guaranteedRecall: Boolean = false): DataFrame =
    summarize(df, Nil, key, k, threshold, guaranteedRecall)

  /** Per-group heavy hitters — the same typed aggregate under
    * `groupBy` (per-source skew profiles, per-topic counters). Output
    * is (group columns..., `key`, `est`); state is `groups × k`
    * counters and the error bound is per GROUP (each group's summary
    * sees only its own n). */
  def heavyHittersBy(df: DataFrame, group: Seq[Column], key: Column,
                     k: Int, threshold: Long,
                     guaranteedRecall: Boolean = false): DataFrame = {
    require(group.nonEmpty,
      "heavyHittersBy needs group columns; use heavyHitters for global")
    summarize(df, group, key, k, threshold, guaranteedRecall)
  }
}
