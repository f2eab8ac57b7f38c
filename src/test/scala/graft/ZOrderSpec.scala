package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order encoding: the Spark expression matches a bit-twiddling
  * reference, and the tiling property q119 relies on holds exactly —
  * every aligned 4^k range of z-values is a 2^k × 2^k tile in (x, y). */
class ZOrderSpec extends SparkSpec {

  private def ref(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bit-twiddling reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200)
      .map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(col("x"), col("y"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 6), s"($x,$y)")
    }
  }

  test("interleave is a bijection on the full 16x16 grid") {
    val zs = for (x <- 0L until 16L; y <- 0L until 16L)
      yield ref(x, y, 4)
    assert(zs.toSet.size == 256 && zs.min == 0L && zs.max == 255L)
  }

  test("aligned z ranges are square tiles (the q119 pruning property)") {
    for (k <- 1 to 3) {
      val side = 1 << k // 2^k
      val groups = (for (x <- 0L until 16L; y <- 0L until 16L)
        yield (ref(x, y, 4) / (side.toLong * side), x, y))
        .groupBy(_._1)
      groups.foreach { case (tile, cells) =>
        val xs = cells.map(_._2); val ys = cells.map(_._3)
        assert(xs.max - xs.min + 1 == side, s"k=$k tile=$tile x-span")
        assert(ys.max - ys.min + 1 == side, s"k=$k tile=$tile y-span")
        assert(cells.size == side * side)
      }
    }
  }

  test("interleaveSql parses in Spark and agrees with the Column form") {
    // the oracle splices this SQL into DuckDB; Spark 4 parses the same
    // infix bit operators, so the two forms can be pinned equal in-JVM
    // (the q119 driver hash then pins Spark == DuckDB on real data)
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val d = (1 to 100)
      .map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
      .toDF("x", "y")
    val rows = d.select(
      ZOrder.interleave(col("x"), col("y"), 6).as("a"),
      expr(ZOrder.interleaveSql("x", "y", 6)).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
