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
}
