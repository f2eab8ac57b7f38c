package graft

import org.apache.spark.sql.functions._

import graft.functions.SuffixRanks

class SuffixRanksSpec extends SparkSpec {
  import spark.implicits._

  // docs chosen to exercise: cross-doc duplicate spans, within-doc
  // repeats, docs shorter than L, and truncated tails
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen quick brown fox jugs"),
    (2L, "aaaaaaaaaaaaaaaa"), // heavy self-repetition
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "tiny"))             // shorter than L

  private def docsDf = docs.toDF("doc", "text")

  /** Naive truth: truncated L-prefix string at each position. */
  private def naive(L: Int): Map[(Long, Long), String] =
    docs.flatMap { case (d, t) =>
      (0 until t.length).map(i => (d, i.toLong) -> t.substring(i, math.min(i + L, t.length)))
    }.toMap

  private def check(L: Int, ordered: Boolean): Unit = {
    val r = SuffixRanks.ranks(docsDf, L, ordered = ordered)
      .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getLong(2)).toMap
    val truth = naive(L)
    assert(r.keySet == truth.keySet)
    // equal rank <=> equal truncated L-prefix, across ALL position pairs
    for (a <- r.keySet; b <- r.keySet if a != b) {
      assert((r(a) == r(b)) == (truth(a) == truth(b)),
        s"positions $a/$b: ranks ${r(a)}/${r(b)} vs prefixes '${truth(a)}'/'${truth(b)}'")
    }
    if (ordered) {
      // rank order = lexicographic truncated-prefix order
      for (a <- r.keySet; b <- r.keySet if truth(a) < truth(b))
        assert(r(a) < r(b), s"order violated at $a vs $b")
    }
  }

  test("rank classes = exact truncated 8-prefix equality (dedup labels)") {
    check(8, ordered = false)
  }

  test("ordered variant: ranks are the suffix-array order at L=8") {
    check(8, ordered = true)
  }

  test("L=16 with docs shorter than L (pure truncation classes)") {
    check(16, ordered = false)
  }

  test("one doubling round plans a keyed join + keyed window — no cartesian, no single-partition exchange") {
    // the round shape in isolation: pair join on (doc, i+k), relabel
    // via min(pos) over the key class
    val p = (0L until 100L).map(i => (i % 7, i % 13, i + 1, i % 29))
      .toDF("doc", "i", "pos", "r")
    val k = 8
    val shifted = p.select(col("doc"), (col("i") - k).as("i"),
      col("r").as("r2"))
    val paired = p.join(shifted, Seq("doc", "i"), "left")
      .withColumn("key", col("r") * 2147483648L + coalesce(col("r2"), lit(0L)))
    val next = paired.withColumn("nr", min(col("pos")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("key"))))
    val plan = next.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 exchanges (join sides + window), got $exchanges:\n$plan")
  }

  test("rejects non-power-of-two L") {
    intercept[IllegalArgumentException] {
      SuffixRanks.ranks(docsDf, 12)
    }
  }

  test("degenerate corpus (one repeated char corpus-wide) stays correct") {
    // The documented precondition case: every position of every doc is
    // 'a', so by round two nearly all positions share ONE rank class
    // and the min(pos) relabel window runs that class in one task.
    // Parallelism degrades; CORRECTNESS must not. Truth: positions
    // with >= L chars remaining (all docs) are one class per distinct
    // truncated-run length.
    val runs = Seq((0L, "a" * 40), (1L, "a" * 25), (2L, "a" * 8))
    val r = SuffixRanks.ranks(runs.toDF("doc", "text"), 16)
      .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getLong(2)).toMap
    val truth = runs.flatMap { case (d, t) =>
      (0 until t.length).map(i =>
        (d, i.toLong) -> t.substring(i, math.min(i + 16, t.length)))
    }.toMap
    assert(r.keySet == truth.keySet)
    for (a <- r.keySet; b <- r.keySet if a != b)
      assert((r(a) == r(b)) == (truth(a) == truth(b)),
        s"$a/$b: ranks ${r(a)}/${r(b)} vs '${truth(a)}'/'${truth(b)}'")
    // and the dominant class really is corpus-scale: every position
    // with >= 16 chars left shares one rank
    val full = truth.filter(_._2.length == 16).keySet
    assert(full.size > 30 && full.map(r).size == 1)
  }

  test("release() frees pinned checkpoint blocks") {
    // localCheckpoint blocks are RDD-level persists invisible to
    // spark.catalog.clearCache(); release() must drain exactly the
    // frames ranks() pinned (other suites may own persists — compare
    // against the before-set, not empty)
    val sc = spark.sparkContext
    SuffixRanks.release() // drain anything earlier tests pinned
    val before = sc.getPersistentRDDs.keySet
    SuffixRanks.ranks(docsDf, 8).count()
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
      "expected new live checkpoint blocks after ranks()")
    SuffixRanks.release()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"release() left persistent RDDs: $leaked")
  }
}
