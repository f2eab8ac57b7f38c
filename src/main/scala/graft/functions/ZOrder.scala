package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding — the multi-dimensional clustering
  * key behind lakehouse `OPTIMIZE ZORDER BY`: interleaving the bits of
  * two bounded dimensions makes ranges of the combined key map to
  * TILES in (x, y) space, so range-partitioning + sorting files by the
  * z-value bounds BOTH dimensions per file and min/max file pruning
  * works for predicates on either column (a single-column sort prunes
  * only its own column).
  *
  * The encoding is built from shift/and/or arithmetic only — no UDF,
  * no lookup table — so it stays inside whole-stage codegen, and the
  * identical formula is emitted as portable SQL for the DuckDB oracle
  * (q119): one definition, two engines, bit-identical values.
  *
  * Inputs must be non-negative and < 2^bits (the caller buckets raw
  * values first — exactly what a layout job does, since z-ordering
  * raw unbounded keys needs a histogram pass anyway).
  */
object ZOrder {

  /** z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << 2i+1) — x in the even
    * bit positions, y in the odd. Pure per-row expression. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same formula as SQL text for the DuckDB oracle side
    * (`>>`/`<<`/`&`/`|` infix bit operators on BIGINT).
    * `xExpr`/`yExpr` are column expressions spliced verbatim; the
    * Spark side uses [[interleave]] and the q119 hash compare pins the
    * two forms bit-equal. */
  def interleaveSql(xExpr: String, yExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"((((($xExpr) >> $i) & 1) << ${2 * i}) | " +
        s"(((($yExpr) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
  }
}
