package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.Sketches
import org.apache.spark.sql.functions._

import graft.functions.Theta

/** Theta sketch aggregate: exact (including set operations) when the
  * per-group keyspace fits 2^lgK (the regime q124's oracle pins),
  * within the library's deterministic confidence bounds oversized,
  * partitioning-independent in the exact regime. */
class ThetaSpec extends SparkSpec {

  // two overlapping keyspaces: g=a holds 0..999, g=b holds 500..1499
  // (true overlap = 500), with heavy duplication
  private lazy val df = {
    import spark.implicits._
    (0 until 3000).map(i => ("a", (i % 1000).toLong))
      .++((0 until 3000).map(i => ("b", 500L + (i % 1000))))
      .toDF("g", "v").repartition(7)
  }

  test("exact regime: per-group estimates equal distinct counts") {
    val got = Theta.sketchBy(df, Seq(col("g")), col("v"))
      .select(col("g"), Theta.estimate(col("theta")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1000L, "b" -> 1000L))
  }

  test("exact regime: intersection and a-not-b are exact") {
    val sk = Theta.sketchBy(df, Seq(col("g")), col("v"))
    val row = sk.as("x").join(sk.as("y"),
        col("x.g") < col("y.g"))
      .select(
        Theta.intersectEstimate(col("x.theta"), col("y.theta")),
        Theta.aNotBEstimate(col("x.theta"), col("y.theta")))
      .head()
    assert(row.getLong(0) == 500L)
    assert(row.getLong(1) == 500L)
  }

  test("exact regime is partitioning-independent") {
    def run(n: Int) = Theta.sketchBy(
      df.repartition(n), Seq(col("g")), col("v"))
      .select(col("g"), Theta.estimate(col("theta")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("null/garbage keys are dropped, not crashed on (ANSI-safe)") {
    import spark.implicits._
    val d = Seq(("a", "12"), ("a", "junk"), ("a", "12"), ("a", null))
      .toDF("g", "v")
    val got = Theta.sketchBy(d, Seq(col("g")), col("v"))
      .select(Theta.estimate(col("theta"))).head().getLong(0)
    assert(got == 1L)
  }

  test("incremental union path: running a-not-b equals exact new-key counts") {
    import spark.implicits._
    // three "sources" arriving in name order with engineered overlap:
    // s1 = 0..599, s2 = 300..899 (300 new), s3 = 0..1199 (300 new)
    val d = ((0 until 600).map(i => ("s1", i.toLong))
      ++ (300 until 900).map(i => ("s2", i.toLong))
      ++ (0 until 1200).map(i => ("s3", i.toLong)))
      .toDF("g", "v").repartition(5)
    val sk = Theta.sketchBy(d, Seq(col("g")), col("v"))
    val prior = sk.as("a").join(sk.as("b"), col("b.g") < col("a.g"))
      .groupBy(col("a.g"))
      .agg(Theta.unionSketches(col("b.theta")).as("prior"))
    val got = sk.join(prior, Seq("g"), "left")
      .select(col("g"),
        when(col("prior").isNull, Theta.estimate(col("theta")))
          .otherwise(Theta.aNotBEstimate(col("theta"), col("prior")))
          .as("n_new"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 600L, "s2" -> 300L, "s3" -> 300L))
  }

  test("unionSketches of exact sketches equals the union's distinct count") {
    val u = Theta.sketchBy(df, Seq(col("g")), col("v"))
      .agg(Theta.unionSketches(col("theta")).as("u"))
      .select(Theta.estimate(col("u"))).head().getLong(0)
    assert(u == 1500L) // 0..1499 across both groups
  }

  test("oversized: true count within the sketch's confidence bounds") {
    import spark.implicits._
    // 50k distinct into a 2^6 = 64-entry sketch: heavy sampling
    val big = (0 until 50000).map(_.toLong).toDF("v").repartition(11)
    val bytes = Theta.sketchBy(big, Nil, col("v"), lgK = 6)
      .head().getAs[Array[Byte]]("theta")
    val sk = Sketches.wrapSketch(Memory.wrap(bytes))
    assert(sk.getEstimate != 50000.0) // genuinely estimating
    assert(sk.getLowerBound(3) <= 50000.0 &&
      50000.0 <= sk.getUpperBound(3),
      s"[${sk.getLowerBound(3)}, ${sk.getUpperBound(3)}]")
    // merge-based build agrees with the bounds too
    val relErr = math.abs(sk.getEstimate - 50000.0) / 50000.0
    assert(relErr < 0.5, s"relErr $relErr")
  }
}
