package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — deterministic multi-level buffer
  * compaction in the Munro–Paterson / Manku–Rajagopalan–Lindsay
  * family ("Approximate medians and other quantiles in one pass and
  * with limited memory", SIGMOD 1998): level i holds values of weight
  * 2^i; a buffer past capacity k is sorted, every second element kept
  * (fixed odd positions — deterministic, so results are reproducible
  * and merge-tree independent IN THE EXACT REGIME and deterministic
  * always), and promoted one level with doubled weight.
  *
  * This is the quantile counterpart of [[Freq]]'s Misra–Gries
  * heavy-hitter summary and completes the mergeable-sketch family for
  * 100-TB profiling: the exact quantile q52 computes needs a full sort
  * (or an `approxQuantile` ACTION outside the plan — what
  * [[Ranks]] uses for its boundary knob); this sketch is a proper
  * group-by-able AGGREGATE — one summary per partition, merged once at
  * the exchange, `O(k · log(n/k))` values per group, keyspace- and
  * corpus-size-independent.
  *
  * Sizing contract (the q121 treatment): with `n ≤ k` per group no
  * compaction ever fires, every value is retained at weight 1 and
  * quantile queries are EXACT — the regime the q123 oracle pins
  * bit-for-bit. Oversized, the discrete rank error after the full
  * merge tree is bounded by `levels · n / (2k)` (each level-i
  * compaction displaces ranks by at most 2^i and fires at most
  * n / (k·2^(i+1)) times); QuantSpec pins that bound empirically.
  *
  * Query semantics (integer-portable, no IEEE in the rank math): the
  * `p`-quantile (p in ppm) is the value at 1-based rank
  * `max(1, ⌈p·n/10⁶⌉)` of the weighted sorted multiset — computed as
  * `(p·n + 999999) div 10⁶` in exact integer arithmetic on BOTH
  * engines, so a DuckDB oracle can mirror the selection without
  * float-vs-decimal ceil drift. */
object Quant {

  final class QuantileSketch(val k: Int) extends Serializable {
    require(k >= 2, s"k must be >= 2, got $k")
    var n: Long = 0L
    // levels(i): values of weight 2^i (level 0 = raw inserts)
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])

    def update(x: Long): Unit = { n += 1; levels(0) += x; carry() }

    def mergeIn(o: QuantileSketch): Unit = {
      n += o.n
      o.levels.zipWithIndex.foreach { case (buf, i) =>
        while (levels.size <= i) levels += mutable.ArrayBuffer.empty[Long]
        levels(i) ++= buf
      }
      carry()
    }

    /** Compact every over-capacity buffer upward. Weight invariant:
      * Σ levels(i).size · 2^i == n at all times — an odd-size buffer
      * keeps its sorted maximum at the current level (deterministic)
      * and compacts the even-size remainder. */
    private def carry(): Unit = {
      var i = 0
      while (i < levels.size) {
        if (levels(i).size > k) {
          val sorted = levels(i).sorted
          val (toCompact, remainder) =
            if (sorted.size % 2 == 0) (sorted, Nil)
            else (sorted.init, Seq(sorted.last))
          val kept = 1 until toCompact.size by 2 map toCompact
          levels(i).clear()
          levels(i) ++= remainder
          if (i + 1 == levels.size)
            levels += mutable.ArrayBuffer.empty[Long]
          levels(i + 1) ++= kept
        }
        i += 1
      }
    }

    /** Discrete quantile at `pPpm` parts-per-million. */
    def query(pPpm: Long): Long = {
      require(n > 0, "quantile of an empty sketch")
      val pairs = levels.zipWithIndex
        .flatMap { case (buf, i) => buf.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      val target = math.max(1L, (pPpm * n + 999999L) / 1000000L)
      var cum = 0L
      var out = pairs.last._1
      val it = pairs.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= target) { out = v; found = true }
      }
      out
    }
  }

  private class QAgg(k: Int, probesPpm: Seq[Long])
      extends Aggregator[Long, QuantileSketch, Seq[Long]] {
    def zero: QuantileSketch = new QuantileSketch(k)
    def reduce(b: QuantileSketch, a: Long): QuantileSketch = {
      b.update(a); b
    }
    def merge(a: QuantileSketch, b: QuantileSketch): QuantileSketch = {
      a.mergeIn(b); a
    }
    def finish(b: QuantileSketch): Seq[Long] =
      if (b.n == 0) Seq.empty else probesPpm.map(b.query)
    def bufferEncoder: org.apache.spark.sql.Encoder[QuantileSketch] =
      Encoders.javaSerialization[QuantileSketch]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group discrete quantiles of `value` (an integral column —
    * the portable discipline: quantiles over cents/chars/micro-units,
    * never raw doubles) at the given ppm probes. Output is the group
    * columns plus `q_<ppm>` long columns, one per probe. Null and
    * non-castable values are dropped (the [[Freq.heavyHitters]]
    * TRY_CAST treatment); empty groups never reach the output (no
    * rows). One aggregation: partial sketches per partition, one
    * merge at the exchange. Pass `group = Nil` for a global
    * profile. */
  def quantilesBy(df: DataFrame, group: Seq[Column], value: Column,
                  k: Int, probesPpm: Seq[Long]): DataFrame = {
    require(probesPpm.nonEmpty, "need at least one probe")
    require(probesPpm.forall(p => p >= 0 && p <= 1000000L),
      s"probes must be ppm in [0, 1000000], got $probesPpm")
    val vl = value.try_cast("long")
    val agged = df.filter(vl.isNotNull)
      .groupBy(group: _*)
      .agg(udaf(new QAgg(k, probesPpm), Encoders.scalaLong)(vl).as("__q"))
      // With group = Nil over an input that is empty after the filter,
      // groupBy().agg still emits ONE global row whose sketch is empty
      // (finish returns Seq.empty); element_at on it would throw under
      // ANSI mode. Dropping it here keeps the documented contract —
      // empty groups (including the empty global profile) never reach
      // the output — and is a no-op for grouped inputs, where a group
      // only exists if at least one row reduced into its sketch.
      .filter(size(col("__q")) === probesPpm.size)
    val groupNames = agged.columns.dropRight(1).toSeq.map(col)
    agged.select(groupNames ++ probesPpm.zipWithIndex.map {
      case (p, i) => element_at(col("__q"), i + 1).as(s"q_$p")
    }: _*)
  }
}
