package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact integer moment census of a fixed-dimension long-vector
  * column: per group, the first-moment vector Σᵢ kᵢ and the full
  * second-moment (Gram) matrix Σᵢ kᵢkᵢᵀ, in ONE pass over the raw
  * vectors.
  *
  * This replaces the chained double-posexplode shape
  * (`posexplode(ku) × posexplode(ku) → groupBy(p, q) → sum(kp·kq)`)
  * that materializes n·d² rows through two Generate operators and
  * probes a hash-aggregate map once per product. Here each input row
  * does its d(d+1)/2 multiply-adds into a primitive long array held
  * per group (upper triangle only — the Gram matrix is symmetric;
  * the mirror is filled once at `finish`), so the per-row cost is a
  * JIT-compiled array loop and the shuffled state is one
  * (d + d(d+1)/2)-long buffer per partition per group instead of a
  * d²-row stream. Long addition and multiplication are exact and
  * commutative, so the sums are BIT-IDENTICAL to the explode form
  * regardless of partitioning or merge order (GramSpec pins this
  * against the explode shape; the q310/q316 DuckDB oracles pin it
  * end-to-end).
  *
  * Preconditions (loud, not silent): every vector must have exactly
  * dimension d — a ragged row raises (the SqDistLong ragged-array
  * lesson: a truncated loop would return a plausible wrong census).
  * Entries must keep Σ kₚk_q within int64 — the callers' milli-unit
  * grid documents that headroom (|k| ≤ 10³ ⇒ |kₚk_q| ≤ 10⁶, exact to
  * ~9·10¹² rows per group).
  */
object Gram {

  /** Buffer layout: [0, d) = first-moment sums, [d, d + tri) = upper
    * triangle of the Gram matrix in (i ≤ j) row-major order. Output:
    * (_1 = first-moment vector, length d; _2 = FULL Gram matrix,
    * length d², row-major — mirrored from the triangle). */
  final class MomentAgg(d: Int)
      extends Aggregator[Array[Long], Array[Long], (Seq[Long], Seq[Long])] {
    private val tri = d * (d + 1) / 2

    def zero: Array[Long] = new Array[Long](d + tri)

    def reduce(buf: Array[Long], v: Array[Long]): Array[Long] = {
      require(v.length == d,
        s"Gram.MomentAgg: expected dimension $d, got ${v.length}")
      var i = 0
      var t = d
      while (i < d) {
        val ki = v(i)
        buf(i) += ki
        var j = i
        while (j < d) { buf(t) += ki * v(j); t += 1; j += 1 }
        i += 1
      }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(buf: Array[Long]): (Seq[Long], Seq[Long]) = {
      val full = new Array[Long](d * d)
      var t = d
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val s = buf(t)
          full(i * d + j) = s
          full(j * d + i) = s
          t += 1; j += 1
        }
        i += 1
      }
      (buf.take(d).toSeq, full.toSeq)
    }

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[(Seq[Long], Seq[Long])] =
      ExpressionEncoder[(Seq[Long], Seq[Long])]()
  }

  /** Aggregate column: struct(_1 array<bigint> first moments,
    * _2 array<bigint> full d² Gram sums, row-major p·d + q). */
  def moments(vec: Column, d: Int): Column =
    udaf(new MomentAgg(d), ExpressionEncoder[Array[Long]]())(vec)
}
