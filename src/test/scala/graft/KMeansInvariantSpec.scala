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
}
