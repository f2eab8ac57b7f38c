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

  test("randomized differential: components == union-find") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 2) {
      val n = 30
      val edges = Seq.fill(25)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // reference: in-memory union-find with min-label roots
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val m = math.min(ra, rb)
          parent(ra) = m; parent(rb) = m }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map(v => v -> find(v.toInt).toLong).toMap
      assert(cc(edges) == expect, s"trial $trial")
    }
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star variant agrees with propagation on chains, rings, random") {
    val chain = (0L until 9L).map(i => (i + 1, i)) // worst case for propagation
    assert(ccStar(chain) == cc(chain))
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
    assert(ccStar(ring) == cc(ring))
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 2) {
      val edges = Seq.fill(25)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      assert(ccStar(edges) == cc(edges), s"trial $trial")
    }
  }

  test("deterministic under partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (3L, 4L))
    def run(parts: Int) = Components.connectedComponents(
        edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(32))
  }

  test("self-loop singletons survive in BOTH variants (contract parity)") {
    // a node whose only edge is (n, n) is a singleton component; the
    // star variant's canon() strips self-loop EDGES but must not
    // strip the node
    val edges = Seq((1L, 2L), (5L, 5L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    assert(ccStar(edges) == cc(edges))
  }

  test("non-convergence at maxIter fails loudly, never silently wrong") {
    // a 10-node chain needs ~9 propagation rounds; maxIter=2 must
    // throw, not return under-merged labels
    val chain = (0L until 10L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Components.connectedComponents(
        chain.toDF("a", "b"), "a", "b", maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
