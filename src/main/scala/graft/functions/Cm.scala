package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.curation.Curation

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005): a d×w counter matrix; est(key) =
  * min over rows i of cell(i, h_i(key)); estimates only ever
  * OVERSTATE (every occurrence of `key` lands in the queried cell;
  * colliders only add). Completes the mergeable-sketch family next to
  * Misra–Gries ([[Freq]] — lower bounds, top-k shaped), the MRL
  * quantile sketch ([[Quant]]) and theta distinct-count ([[Theta]]):
  * CM is the POINT-FREQUENCY side — "how often does this key occur",
  * any key, upper-bounded error ε = e/w per unit n with failure
  * probability e^−d.
  *
  * Spark-first design note: unlike MG/MRL/theta, CM state IS a keyed
  * count — cell (i, bucket) → long — so the idiomatic engine form is
  * not a typed imperative aggregate but a plain `groupBy(d, bucket)
  * .count()`: map-side partial aggregation bounds the exchange at
  * ≤ d·w rows per partition (exactly the sketch's space promise),
  * merge is the built-in sum (trivially mergeable / incremental /
  * streaming-capable), and the whole pipeline stays in whole-stage
  * codegen — no serialized buffers, no ObjectHashAggregate.
  *
  * Hashing is the engine-portable md5-u32 construction
  * ([[Curation.contentU32]] on `"<row>:<key>"`), so the DuckDB oracle
  * can rebuild the IDENTICAL matrix and check the estimates
  * themselves — not just an exact-regime special case: collisions and
  * their overcounts are part of the pinned answer (q152).
  */
object Cm {

  /** Row index i of the matrix, hashed per key: h_i(key) =
    * u32(md5("i:key")) mod w. */
  private def bucket(d: Column, key: Column, w: Int): Column =
    pmod(Curation.contentU32(concat_ws(":", d, key)), lit(w.toLong))

  /** Build the d×w matrix over `key` (any castable-to-string column):
    * one frame of ≤ d·w rows (`d`, `bucket`, `c`). The input stream is
    * exploded ×d, but the partial aggregation collapses each partition
    * to ≤ d·w cells before the exchange. */
  def sketch(df: DataFrame, key: Column, d: Int, w: Int): DataFrame =
    df.select(key.as("key"),
        explode(array((0 until d).map(lit): _*)).as("d"))
      .select(col("d"), bucket(col("d"), col("key"), w).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for a probe frame carrying a `key` column: joins
    * each probe key's d cells against the (broadcast, ≤ d·w row)
    * matrix and takes the row-wise min. Pass-through of every other
    * probe column; adds `est`. */
  def estimate(cells: DataFrame, probes: DataFrame, d: Int,
               w: Int): DataFrame = {
    val carry = probes.columns.toSeq
    probes
      .select(carry.map(col) :+
        explode(array((0 until d).map(lit): _*)).as("d"): _*)
      .withColumn("bucket", bucket(col("d"), col("key"), w))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(carry.map(col): _*)
      .agg(min(col("c")).as("est"))
  }
}
