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

  private def check(L: Int, ordered: Boolean,
                    wideBase: Boolean = false): Unit = {
    val r = SuffixRanks.ranks(docsDf, L, ordered = ordered,
        wideBase = wideBase)
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

  test("wideBase: identical rank semantics with one fewer round (both variants)") {
    // 16-byte packed base (two longs) — levels start at 2b; the final
    // level's classes and (ordered) order must match the narrow path's
    check(16, ordered = false, wideBase = true)
    check(16, ordered = true, wideBase = true)
    check(32, ordered = true, wideBase = true)
  }

  test("wideBase ordered labels are value-identical to the narrow path") {
    val wide = SuffixRanks.ranks(docsDf, 32, ordered = true, wideBase = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    SuffixRanks.release()
    val narrow = SuffixRanks.ranks(docsDf, 32, ordered = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wide == narrow)
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

  test("q353 LCP array equals the naive sorted-suffix LCP (third implementation)") {
    // The engine computes LCP by binary lifting over rank levels; the
    // DuckDB oracle counts matching prefix positions after a full
    // sort. This is a THIRD, driver-side implementation over the same
    // slice — sort all truncated suffixes, compare neighbors char by
    // char — so a shared blind spot between the two engines' set
    // arithmetic can't hide.
    val sf = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, sf)
      .filter(col("doc_id") < 50).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val sufs = texts.flatMap { case (d, t) =>
      (0 until t.length).map(i =>
        (t.substring(i, math.min(i + 64, t.length)), d, i.toLong))
    }
    // engine order is (rank, pos) = (prefix, doc, i): pos is the
    // doc-ordered global offset, monotone in (doc, i)
    val sorted = sufs.sortBy { case (p, d, i) => (p, d, i) }
    def lcp(a: String, b: String): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    val expected = sorted.zipWithIndex.map { case ((p, d, i), j) =>
      (d, i) -> (if (j == 0) 0L else lcp(sorted(j - 1)._1, p))
    }.toMap
    val got = graft.queries.TextQueries.q353.run(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    val diffs = expected.collect {
      case (k, v) if got(k) != v => (k, v, got(k))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("q354 BWT runs census equals the naive per-doc BWT (third implementation)") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.nonEmpty)
    val agg = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    for ((_, src, t) <- docs) {
      val order = (0 until t.length).sortBy(i =>
        (t.substring(i, math.min(i + 64, t.length)), i))
      var prev = -1; var runs = 0L; var first = true
      for (i <- order) {
        val b = if (i == 0) 0 else t.charAt(i - 1).toInt
        if (first || b != prev) runs += 1
        prev = b; first = false
      }
      val (nd, np, nr) = agg.getOrElse(src, (0L, 0L, 0L))
      agg(src) = (nd + 1, np + t.length, nr + runs)
    }
    val got = graft.queries.TextQueries.q354.run(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == agg.keySet)
    for ((src, (nd, np, nr)) <- agg)
      assert(got(src) == (nd, np, nr, nr * 1000000L / np), s"source $src")
  }

  test("q352 posting compression equals the naive driver-side codec costs") {
    val sf = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val postings = texts.flatMap { case (d, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (w, d))
    }.distinct
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val u = texts.length.toLong
    val perBand = postings.groupBy(_._1).toSeq.map { case (_, ps) =>
      val ids = ps.map(_._2).sorted
      val gaps = (ids.head + 1) +: ids.sliding(2).collect {
        case Array(a, b) => b - a
      }.toSeq
      val df = ids.size.toLong
      val l = math.max(0L, bitlen(u / df) - 1)
      (bitlen(df), df, gaps.map(bitlen).sum,
        gaps.map(g => (bitlen(g) + 6) / 7).sum, df * (l + 2))
    }.groupBy(_._1).map { case (band, ts) =>
      band -> (ts.size.toLong, ts.map(_._2).sum, ts.map(_._3).sum,
        ts.map(_._4).sum, ts.map(_._5).sum)
    }
    val got = graft.queries.TextQueries.q352.run(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(got.keySet == perBand.keySet)
    for ((band, (nt, np, gb, vb, ef)) <- perBand) {
      val (gnt, gnp, ggb, gvb, gef, graw, gvppm, gefppm) = got(band)
      assert((gnt, gnp, ggb, gvb, gef) == (nt, np, gb, vb, ef),
        s"band $band")
      assert(graw == np * 64 && gvppm == vb * 8L * 1000000L / graw &&
        gefppm == ef * 1000000L / graw, s"band $band ratios")
    }
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
