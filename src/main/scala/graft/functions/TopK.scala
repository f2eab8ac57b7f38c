package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state top-k-per-group as a typed aggregate — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k` idiom (q15/q77's shape). The window form shuffles and SORTS
  * every input row into its group's partition before discarding all
  * but k; this aggregate keeps a k-bounded buffer per partial, so the
  * exchange carries at most `k` rows per group per partition and the
  * reducer merges buffers instead of sorting the group — on a
  * 100-TB/1000-executor shuffle that is the difference between moving
  * the table and moving the answer. Same mergeable-summary contract
  * as the sketch family ([[Freq]]/[[Quant]]/[[Theta]]), but EXACT at
  * any size: top-k under a total order is computable from per-partial
  * top-k's, no approximation regime.
  *
  * Determinism: the order is the (ord, id) pair — ties on `ord` break
  * to the smaller id, and `id` is expected unique per group (the
  * caller's key contract, same as every pinned-order query in this
  * repo) — so results are partitioning-independent and
  * oracle-comparable bit-for-bit. */
object TopK {

  /** Bounded buffer: the best `k` (key, id) pairs in ascending
    * lexicographic order, where callers pre-map "best" onto SMALLEST
    * key. Insert is O(log k); the worst element is evicted on
    * overflow. */
  final class TopKBuf(val k: Int) extends Serializable {
    require(k >= 1, s"k must be >= 1, got $k")
    val set: mutable.TreeSet[(Long, Long)] = mutable.TreeSet.empty
    def insert(x: (Long, Long)): Unit = {
      set += x
      if (set.size > k) set -= set.last
    }
    def mergeIn(o: TopKBuf): Unit = o.set.foreach(insert)
  }

  private class TopKAgg(k: Int, largest: Boolean)
      extends Aggregator[(Long, Long), TopKBuf, Seq[(Long, Long)]] {
    // "best first" = ascending (key, id) with key = ord negated in
    // largest mode (ord = Long.MinValue is unrepresentable negated;
    // real order keys — counts, cents, chars — never touch it)
    private def key(ord: Long): Long = if (largest) -ord else ord
    def zero: TopKBuf = new TopKBuf(k)
    def reduce(b: TopKBuf, a: (Long, Long)): TopKBuf = {
      b.insert((key(a._1), a._2)); b
    }
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = { a.mergeIn(b); a }
    def finish(b: TopKBuf): Seq[(Long, Long)] =
      b.set.toSeq.map { case (kk, id) => (id, if (largest) -kk else kk) }
    def bufferEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
      Encoders.javaSerialization[TopKBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top `k` rows per group by `ord` (long; `largest=false` for
    * bottom-k, which with a hash-priority `ord` is a deterministic
    * per-group reservoir sample). Output: (group columns..., `rnk`
    * 1-based, `id`, `ord`), unordered across groups. Null ord/id rows
    * are dropped (TRY_CAST, the [[Freq]] treatment). */
  def perGroup(df: DataFrame, group: Seq[Column], ord: Column,
               id: Column, k: Int, largest: Boolean = true): DataFrame = {
    val ol = ord.try_cast("long")
    val il = id.try_cast("long")
    val agged = df.filter(ol.isNotNull && il.isNotNull)
      .groupBy(group: _*)
      .agg(udaf(new TopKAgg(k, largest),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(ol, il)
        .as("__top"))
    val groupNames = agged.columns.dropRight(1).toSeq.map(col)
    agged
      .select(groupNames :+ posexplode(col("__top")).as(Seq("__p", "__r")): _*)
      .select(groupNames :+ (col("__p") + 1).cast("long").as("rnk")
        :+ col("__r._1").as("id") :+ col("__r._2").as("ord"): _*)
  }
}
