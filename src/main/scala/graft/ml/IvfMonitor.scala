package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF quantizer MAINTENANCE: decide from data whether the stored
  * coarse quantizer has drifted enough to retrain — the operational
  * piece of the ANN family (index build q38/q43, assignment q43b,
  * search q32/q33/q135).
  *
  * [[driftCensus]] takes the stored centroids and a fresh data slice,
  * runs ONE Lloyd step entirely in exact integer arithmetic
  * (micro-unit coordinates), and reports per stored cell how the
  * assignment would move: members, shifted count/fraction, and the
  * quantization error before vs after. A high shift fraction or a
  * large error drop is the retrain signal; near-zero means the stored
  * quantizer still fits the incoming distribution.
  *
  * Scale: centroid sets are bounded by construction (the IVF k), so
  * both assignment passes are broadcast cross-joins with a per-vector
  * argmin window (partitioned by vec_id over k candidates — never a
  * data-sized sort); the recomputed centroids ride a (cid, pos) keyed
  * aggregation of members × dim rows, the standard element-wise shape
  * that distributes on any cluster. Integer means use floor(sum/n) on
  * doubles — exact for micro-unit sums far below 2^53 — so DuckDB
  * mirrors every value bit-for-bit.
  */
object IvfMonitor {

  /** Nearest-centroid assignment: argmin of exact integer squared
    * distance, ties to the lower cid. `vectors`: (vec_id, k
    * array<long>); `centroids`: (cid, ck array<long>). Returns
    * (vec_id, cid, d2). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
    vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cid"),
        graft.functions.Vectors.sqDistL(col("k"), col("ck")).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("d2"))
  }

  /** One-Lloyd-step drift census (see object doc). Output: one row
    * per stored cell that received fresh members — (cid, n_members,
    * n_shifted, shift_ppm, d2_stored, d2_new), ordered by cid. */
  def driftCensus(fresh: DataFrame, centroids: DataFrame): DataFrame = {
    val a0 = assign(fresh, centroids)
    // recompute each cell's centroid as the element-wise integer mean
    // of its fresh members; cells with no members keep the stored one
    val sums = fresh.join(a0.select(col("vec_id"), col("cid")), Seq("vec_id"))
      .select(col("cid"), posexplode(col("k")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("m"))
    val stored = centroids
      .select(col("cid"), posexplode(col("ck")).as(Seq("pos", "cv")))
    val newCent = stored.join(sums, Seq("cid", "pos"), "left")
      .select(col("cid"), col("pos"), coalesce(col("m"), col("cv")).as("e"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("e")))),
        s => s.getField("e")).as("ck"))
    val a1 = assign(fresh, newCent)
      .select(col("vec_id"), col("cid").as("cid1"), col("d2").as("d21"))
    a0.join(a1, Seq("vec_id"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("cid1") =!= col("cid"), 1L).otherwise(0L))
          .as("n_shifted"),
        sum(col("d2")).as("d2_stored"),
        sum(col("d21")).as("d2_new"))
      .withColumn("shift_ppm", expr("n_shifted * 1000000 div n_members"))
      .select(col("cid"), col("n_members"), col("n_shifted"),
        col("shift_ppm"), col("d2_stored"), col("d2_new"))
      .orderBy("cid")
  }
}
