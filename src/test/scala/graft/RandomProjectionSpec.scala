package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.queries.VectorQueries

/** Johnson–Lindenstrauss distance preservation for the Rademacher
  * projection (q134's kernel): for ±1 rows, E[‖y_a−y_b‖²] =
  * dOut·‖x_a−x_b‖², so the per-pair distortion ratio
  * ‖y_a−y_b‖² / (dOut·‖x_a−x_b‖²) concentrates around 1 with
  * relative spread ~√(2/dOut) ≈ 0.35 at dOut=16. Deterministic data
  * + deterministic sign matrix → the measured distribution is a
  * regression pin, with bounds wide enough to be theory-motivated
  * rather than overfit. */
class RandomProjectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val dOut = 16

  test("pairwise squared-distance distortion concentrates around 1") {
    val k = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 60)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))
          .as("k"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val signs = (0 until dOut)
      .map(j => Vectors.hyperplane(j, 64).map(_.toLong).toArray)
    def proj(x: Array[Long]): Array[Long] =
      signs.map(s => s.zip(x).map { case (a, b) => a * b }.sum).toArray
    val y = k.map { case (id, x) => id -> proj(x) }.toMap
    val dist = for {
      (ia, xa) <- k; (ib, xb) <- k if ia < ib
    } yield {
      def d2(a: Array[Long], b: Array[Long]): Double =
        a.zip(b).map { case (p, q) => val d = p - q; d.toDouble * d }.sum
      d2(y(ia), y(ib)) / (dOut * d2(xa, xb))
    }
    val sorted = dist.sorted
    val med = sorted(sorted.length / 2)
    val p05 = sorted((sorted.length * 0.05).toInt)
    val p95 = sorted((sorted.length * 0.95).toInt)
    info(f"distortion median=$med%.3f p05=$p05%.3f p95=$p95%.3f " +
      s"over ${dist.length} pairs")
    assert(med > 0.8 && med < 1.25, f"median $med%.3f")
    assert(p05 > 0.4, f"p05 $p05%.3f")
    assert(p95 < 2.0, f"p95 $p95%.3f")
  }

  test("Spark projection matches the in-test reference on a slice") {
    val got = VectorQueries.q134.run(spark, sf)
      .filter(col("vec_id") === 3 && col("dim") === 2)
      .select("val").collect().map(_.getLong(0))
    val x = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 3)
      .select(transform(col("embedding"),
        v => floor(v.cast("double") * 1e6 + lit(0.5)).cast("long")))
      .head().getSeq[Long](0).toArray
    val want = Vectors.hyperplane(2, 64).map(_.toLong)
      .zip(x).map { case (a, b) => a * b }.sum
    assert(got.toSeq == Seq(want))
  }
}
