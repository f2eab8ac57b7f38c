package graft

import graft.functions.KCore

/** [[graft.functions.KCore.peelCensus]] — fixed-budget k-core peeling
  * census (round r = graph after r peels; empty survivors census as
  * zero rows; convergence readable as equal consecutive rows). */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  private def census(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.peelCensus(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq

  test("triangle with a pendant: one peel removes the pendant, then stable") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    val got = census(g, k = 2, rounds = 3)
    assert(got == Seq(
      (0L, 4L, 8L, 1L, 3L), // pendant node 4 has degree 1
      (1L, 3L, 6L, 2L, 2L), // triangle survives
      (2L, 3L, 6L, 2L, 2L), // converged: row 1 == row 2
      (3L, 3L, 6L, 2L, 2L)))
  }

  test("a path fully dissolves at k=2, then censuses zero rows") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val got = census(g, k = 2, rounds = 3)
    assert(got == Seq(
      (0L, 4L, 6L, 1L, 2L),
      (1L, 2L, 2L, 1L, 1L), // endpoints peeled, middle edge remains
      (2L, 0L, 0L, 0L, 0L), // everything gone
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("randomized differential: final census == in-memory peeler") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2) {
      val n = 20
      val base = Seq.fill(40)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val g = sym(base).distinct
      val k = 3
      // in-memory reference peeler to fixpoint
      var edges = g.toSet
      var stable = false
      var guard = 0
      while (!stable && guard < 50) {
        val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        stable = next == edges
        edges = next
        guard += 1
      }
      val expN = edges.map(_._1).size.toLong
      val expNodes = edges.map(_._1).toSet.size.toLong
      val expEdges = edges.size.toLong
      val got = census(g, k, rounds = guard + 1).last
      assert((got._2, got._3) == (expNodes, expEdges),
        s"got $got expected nodes=$expNodes edges=$expEdges")
    }
  }
}
