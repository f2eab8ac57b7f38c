package graft

import graft.functions.Components

/** [[graft.functions.Components.connectedComponents]] — transitive
  * closure over undirected edges by min-label propagation. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains collapse transitively (the case the pairwise rule misses)") {
    // A~B, B~C but A!~C: all three must share one component
    assert(cc(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint clusters keep distinct min labels") {
    val got = cc(Seq((5L, 9L), (9L, 5L), (2L, 7L), (10L, 11L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L,
      10L -> 10L, 11L -> 10L))
  }

  test("a ring needs diameter/2 rounds and still converges") {
    val n = 12L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    assert(cc(ring) == (0L until n).map(_ -> 0L).toMap)
  }

  test("deterministic under partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (3L, 4L))
    def run(parts: Int) = Components.connectedComponents(
        edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(32))
  }
}
