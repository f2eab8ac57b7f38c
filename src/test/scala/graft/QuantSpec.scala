package graft

import org.apache.spark.sql.functions._

import graft.functions.Quant
import graft.functions.Quant.QuantileSketch

/** Mergeable quantile sketch: exact when capacity exceeds the group
  * size (the regime q123's oracle pins), deterministic bounded rank
  * error oversized, weight-conserving under any merge tree. */
class QuantSpec extends SparkSpec {

  // deterministic, duplicate-heavy, unordered values
  private val values: Vector[Long] =
    Vector.tabulate(5000)(i => ((i * 2654435761L) % 997) % 350)

  private val probes = Seq(100000L, 250000L, 500000L, 750000L,
    900000L, 990000L)

  /** Reference: the integer rank rule over the fully sorted data. */
  private def exactQuantile(xs: Seq[Long], pPpm: Long): Long = {
    val sorted = xs.sorted
    val target = math.max(1L, (pPpm * xs.size + 999999L) / 1000000L)
    sorted((target - 1).toInt)
  }

  test("exact regime (n <= k): every probe equals the sorted-rank value") {
    val sk = new QuantileSketch(8192)
    values.foreach(sk.update)
    assert(sk.n == values.size)
    probes.foreach { p =>
      assert(sk.query(p) == exactQuantile(values, p), s"probe $p")
    }
  }

  test("exact regime is merge-tree independent") {
    def build(xs: Seq[Long]): QuantileSketch = {
      val sk = new QuantileSketch(8192); xs.foreach(sk.update); sk
    }
    // left-deep merge of 10 chunks vs one flat sketch vs pair tree
    val chunks = values.grouped(500).toSeq
    val leftDeep = chunks.map(build).reduceLeft { (a, b) =>
      a.mergeIn(b); a
    }
    val pairs = chunks.grouped(2).map { g =>
      val s = build(g.head); g.tail.foreach(c => s.mergeIn(build(c))); s
    }.reduceLeft { (a, b) => a.mergeIn(b); a }
    probes.foreach { p =>
      val want = exactQuantile(values, p)
      assert(leftDeep.query(p) == want && pairs.query(p) == want, s"$p")
    }
  }

  test("oversized: rank error within levels*n/(2k) after a merge tree") {
    for (k <- Seq(16, 64, 256)) {
      val sk = values.grouped(700).map { c =>
        val s = new QuantileSketch(k); c.foreach(s.update); s
      }.reduceLeft { (a, b) => a.mergeIn(b); a }
      assert(sk.n == values.size)
      // weight invariant holds after compaction + merges
      val mass = sk.levels.zipWithIndex
        .map { case (b, i) => b.size.toLong << i }.sum
      assert(mass == sk.n)
      val sorted = values.sorted
      val bound = (sk.levels.size.toLong * sk.n) / (2L * k) + 1
      probes.foreach { p =>
        val got = sk.query(p)
        val target = math.max(1L, (p * sk.n + 999999L) / 1000000L)
        // true rank range of the returned value in the sorted data
        // (the sketch only ever stores inserted values, so got is a
        // real data value — indexOf can't miss)
        val lo = sorted.indexOf(got).toLong + 1
        val hi = sorted.lastIndexOf(got).toLong + 1
        assert(lo >= 1, s"sketch invented value $got")
        val err =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0L
        assert(err <= bound, s"k=$k p=$p err=$err bound=$bound")
      }
    }
  }

  test("quantilesBy: grouped exact regime, null/garbage keys dropped") {
    import spark.implicits._
    val df = values.zipWithIndex.map { case (v, i) =>
      (if (i % 2 == 0) "a" else "b", v.toString)
    }.toDF("g", "v")
      .unionByName(Seq(("a", "junk"), ("b", null)).toDF("g", "v"))
    val got = Quant.quantilesBy(df, Seq(col("g")), col("v"),
      k = 8192, probesPpm = Seq(500000L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (as, bs) = values.zipWithIndex.partition(_._2 % 2 == 0)
    assert(got == Map(
      "a" -> exactQuantile(as.map(_._1), 500000L),
      "b" -> exactQuantile(bs.map(_._1), 500000L)))
  }

  test("quantilesBy: empty global profile yields no rows, not an ANSI throw") {
    import spark.implicits._
    // all values garbage → empty after the try_cast filter; with
    // group = Nil the agg still emits one global row whose sketch is
    // empty — the guard must drop it instead of letting element_at
    // throw INVALID_ARRAY_INDEX under ANSI mode
    val df = Seq("junk", null, "nope").toDF("v")
    assert(Quant.quantilesBy(df, Nil, col("v"),
      k = 16, probesPpm = Seq(500000L)).count() == 0L)
  }

  test("quantilesBy is partitioning-independent in the exact regime") {
    import spark.implicits._
    def run(parts: Int) = Quant.quantilesBy(
      values.toDF("v").repartition(parts), Nil, col("v"),
      k = 8192, probesPpm = probes)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
