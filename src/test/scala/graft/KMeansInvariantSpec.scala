package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.functions._

/** The q43 quantizer's assignment invariant, against the REAL trained
  * model (q43b oracles the same argmin machinery with data-derived
  * seed centroids — this spec closes the loop on the trained ones):
  * every point's predicted cluster must be the argmin of squared
  * euclidean distance over the model's own clusterCenters. MLlib
  * guarantees exactly this contract for its predict path, so any
  * divergence would mean our broadcast-crossJoin assignment (the IVF
  * building block) disagrees with the quantizer it serves. */
class KMeansInvariantSpec extends SparkSpec {

  test("trained k-means predictions equal brute-force centroid argmin") {
    val toVec = udf((xs: Seq[Double]) => MlVectors.dense(xs.toArray))
    val data = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        toVec(transform(col("embedding"), _.cast("double")))
          .as("features"))
      .cache()
    val model = new KMeans().setK(8).setSeed(42L).setMaxIter(5).fit(data)
    val centers = model.clusterCenters.map(_.toArray)
    val predicted = model.transform(data)
      .select(col("vec_id"), col("prediction"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val points = data.collect().map(r =>
      r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
    data.unpersist()
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    points.foreach { case (id, p) =>
      val best = centers.zipWithIndex.minBy { case (c, i) => (d2(p, c), i) }._2
      assert(d2(p, centers(predicted(id))) <= d2(p, centers(best)) + 1e-9,
        s"vec $id: predicted ${predicted(id)} is not the argmin ($best)")
    }
  }

  // ---- q174 drift-census semantics on constructed fixtures ---------

  private def freshDf(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "k")
  }

  private def centDf(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("cid", "ck")
  }

  test("drift census: fresh data matching the stored blobs reports zero shift") {
    // three well-separated 2-D blobs whose stored centroids ARE the
    // blob means -> the Lloyd step recomputes the same centroids and
    // nothing shifts
    val cents = centDf(Seq(0L -> Seq(0L, 0L), 1L -> Seq(1000L, 0L),
      2L -> Seq(0L, 1000L)))
    val fresh = freshDf(Seq(
      10L -> Seq(-2L, 0L), 11L -> Seq(2L, 0L),
      20L -> Seq(998L, 0L), 21L -> Seq(1002L, 0L),
      30L -> Seq(0L, 998L), 31L -> Seq(0L, 1002L)))
    val rows = graft.ml.IvfMonitor.driftCensus(fresh, cents).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") == 2L)
      assert(r.getAs[Long]("n_shifted") == 0L)
      assert(r.getAs[Long]("shift_ppm") == 0L)
      // blob means equal stored centroids, so error is unchanged
      assert(r.getAs[Long]("d2_stored") == r.getAs[Long]("d2_new"))
    }
  }

  test("drift census: a migrated blob shifts wholesale and error drops") {
    // cell 1's fresh data has moved to (500, 500): the recomputed
    // centroid follows it, every migrated point stays nearest to the
    // moved centroid, and the quantization error collapses
    val cents = centDf(Seq(0L -> Seq(0L, 0L), 1L -> Seq(1000L, 0L)))
    val fresh = freshDf(Seq(
      10L -> Seq(-2L, 0L), 11L -> Seq(2L, 0L),
      20L -> Seq(598L, 500L), 21L -> Seq(602L, 500L)))
    val rows = graft.ml.IvfMonitor.driftCensus(fresh, cents).collect()
      .map(r => r.getAs[Long]("cid") -> r).toMap
    // cell 0 unchanged
    assert(rows(0L).getAs[Long]("n_shifted") == 0L)
    // cell 1: the recomputed centroid moves to (600, 500); both
    // members stay assigned to cid 1 (no shift) but the error drops
    assert(rows(1L).getAs[Long]("n_members") == 2L)
    assert(rows(1L).getAs[Long]("d2_new") < rows(1L).getAs[Long]("d2_stored"),
      s"error should drop after the Lloyd step: ${rows(1L)}")
  }

  test("drift census: points nearer a neighboring recomputed centroid shift cells") {
    // stored centroids at 0 and 100; fresh members of cell 0 sit at
    // 40 and 44 (still nearest 0), cell 1's members sit at 60, 140.
    // Recomputed: c0 = 42, c1 = 100. Point 60 (stored cell 1) is now
    // nearer c0=42 (|60-42|=18 < |60-100|=40) -> shifts out of cell 1.
    val cents = centDf(Seq(0L -> Seq(0L), 1L -> Seq(100L)))
    val fresh = freshDf(Seq(10L -> Seq(40L), 11L -> Seq(44L),
      20L -> Seq(60L), 21L -> Seq(140L)))
    val rows = graft.ml.IvfMonitor.driftCensus(fresh, cents).collect()
      .map(r => r.getAs[Long]("cid") -> r).toMap
    assert(rows(1L).getAs[Long]("n_shifted") == 1L)
    assert(rows(1L).getAs[Long]("shift_ppm") == 500000L)
    assert(rows(0L).getAs[Long]("n_shifted") == 0L)
  }

  test("drift census: empty cells keep their stored centroid") {
    // cell 9 receives no fresh members; it must not produce a census
    // row, and its STORED centroid must still participate in the
    // re-assignment (point 30 stays nearest to it, not to the
    // recomputed c0)
    val cents = centDf(Seq(0L -> Seq(0L), 9L -> Seq(50L)))
    val fresh = freshDf(Seq(10L -> Seq(-4L), 11L -> Seq(4L),
      30L -> Seq(49L)))
    val rows = graft.ml.IvfMonitor.driftCensus(fresh, cents).collect()
    val byCid = rows.map(r => r.getAs[Long]("cid") -> r).toMap
    assert(byCid.keySet == Set(0L, 9L))
    assert(byCid(9L).getAs[Long]("n_members") == 1L)
    assert(byCid(9L).getAs[Long]("n_shifted") == 0L)
  }
}
