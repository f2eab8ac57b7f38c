package graft

import org.apache.spark.sql.functions._

import graft.functions.PageRank

/** [[graft.functions.PageRank]] — fixed-iteration rank propagation
  * with integer pico-unit contributions. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric ring converges to the uniform distribution") {
    val n = 8L
    val ring = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), ((i + 1) % n, i)))
    val r = PageRank.run(ring.toDF("src", "dst"), "src", "dst",
        iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == n)
    // every node identical by symmetry; mass sums to ~1
    assert(r.values.toSet.size == 1)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("hub out-ranks spokes on a star graph") {
    // spokes 1..5 <-> hub 0 (symmetrized)
    val star = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = PageRank.run(star.toDF("src", "dst"), "src", "dst",
        iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L) * 2)
    assert((1L to 5L).map(r).toSet.size == 1)
  }

  test("50 iterations run with a bounded plan (lineage truncated)") {
    // Each round references the rank frame twice, so an unbounded
    // plan DOUBLES per iteration — 50 rounds would be ~2^50 nodes.
    // The every-3rd-round checkpoint caps the tail segment at ~8
    // rank-frame copies.
    val edges = (0L until 20L).flatMap(i =>
      Seq((i, (i + 1) % 20), ((i + 1) % 20, i)))
    val out = PageRank.run(edges.toDF("src", "dst"), "src", "dst",
      iterations = 50)
    val planDepth = out.queryExecution.optimizedPlan.collect {
      case p => p
    }.size
    assert(planDepth < 250, s"plan has $planDepth nodes — lineage grew")
    val r = out.collect().map(x => x.getDouble(1))
    assert(math.abs(r.sum - 1.0) < 1e-6)
  }
}
