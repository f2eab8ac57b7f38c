package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK
import graft.functions.TopK.TopKBuf

/** Bounded top-k aggregate: exact under any partitioning/merge tree,
  * deterministic tie-breaks, bottom-k mode as the hash-priority
  * reservoir, garbage-input tolerance. */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  test("buffer keeps the k best and evicts deterministically") {
    val b = new TopKBuf(3)
    Seq((5L, 1L), (1L, 2L), (3L, 3L), (1L, 1L), (9L, 9L))
      .foreach(b.insert)
    // ascending (key, id): (1,1) (1,2) (3,3) survive; (5,1) (9,9) out
    assert(b.set.toSeq == Seq((1L, 1L), (1L, 2L), (3L, 3L)))
  }

  test("merge-tree independence: split buffers equal one flat buffer") {
    val xs = (0 until 500).map(i =>
      (((i * 2654435761L) % 101), i.toLong))
    val flat = new TopKBuf(7); xs.foreach(flat.insert)
    val parts = xs.grouped(13).map { chunk =>
      val p = new TopKBuf(7); chunk.foreach(p.insert); p
    }.toSeq
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.set.toSeq == flat.set.toSeq)
  }

  test("perGroup top-k matches a window over any partitioning") {
    val df = (1 to 200).map(i =>
      (s"g${i % 3}", (i * 37 % 50).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(7)
    val got = TopK.perGroup(df, Seq(col("g")), col("v"), col("id"), 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 4)
      .select("g", "rnk", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("bottom-k with a hash priority is a deterministic reservoir") {
    val df = (1 to 100).map(i => ("s", i.toLong)).toDF("g", "id")
      .withColumn("pri", graft.curation.Curation.contentU32(col("id")))
    val a = TopK.perGroup(df.repartition(2), Seq(col("g")), col("pri"),
      col("id"), 5, largest = false).select("id").as[Long].collect().toSet
    val b = TopK.perGroup(df.repartition(11), Seq(col("g")), col("pri"),
      col("id"), 5, largest = false).select("id").as[Long].collect().toSet
    assert(a == b && a.size == 5)
  }

  test("shuffle bytes measured: agg ≈ inferred-window-limit ≪ naive window") {
    // The honest three-way measurement behind TopK's positioning
    // (200k rows, 4 groups, 8 partitions; AQE off so the executed
    // plans are plain trees with readable exchange metrics):
    //  - naive window (InferWindowGroupLimit excluded): EVERY row
    //    crosses the group exchange — the shape both bounded forms
    //    exist to avoid;
    //  - Spark 4's own InferWindowGroupLimit: the adjacent
    //    `filter(rnk <= k)` is pushed into a map-side
    //    WindowGroupLimitExec, bounding the exchange to k rows per
    //    group per partition — the optimizer already covers the
    //    CLASSIC idiom (this test originally claimed otherwise and
    //    the measurement corrected it);
    //  - the TopK aggregate: same bounded exchange (compact
    //    hand-serialized buffers — default Java serialization was
    //    measured at 1.5 KB per k=3 buffer, 15x the payload), same
    //    magnitude as the inferred form, and it additionally runs
    //    where the window rewrite cannot: under streaming update
    //    mode and composed with sibling aggregates in ONE pass.
    val aqe = "spark.sql.adaptive.enabled"
    val excl = "spark.sql.optimizer.excludedRules"
    val prevAqe = spark.conf.get(aqe)
    val prevExcl = spark.conf.getOption(excl)
    spark.conf.set(aqe, "false")
    try {
      def base = spark.range(0, 200000, 1, 8).toDF("id")
        .select(concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
          ((col("id") * 2654435761L) % 1000003L).as("v"), col("id"))
      // ONE collect per frame: SQLMetrics zero on re-execution while
      // the materialized shuffle is REUSED, so a second collect reads
      // dataSize=0 — measure and take rows from the same (first) run
      def runOnce(df: org.apache.spark.sql.DataFrame)
          : (Long, Seq[(String, Long, Long, Long)]) = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).sorted.toSeq
        def walk(p: SparkPlan): Long = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case s: ShuffleExchangeExec =>
            s.metrics("dataSize").value + s.children.map(walk).sum
          case other => other.children.map(walk).sum
        }
        val got = walk(df.queryExecution.executedPlan)
        assert(got > 0, "no shuffle metrics found — traversal broken?")
        (got, rows)
      }
      def winForm = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
        base.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3).select("g", "rnk", "id", "v")
      }
      val (a, rowsA) = runOnce(TopK.perGroup(base, Seq(col("g")),
        col("v"), col("id"), 3))
      val (b, rowsB) = runOnce(winForm)
      spark.conf.set(excl,
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
      val (c, rowsC) = runOnce(winForm)
      assert(rowsA == rowsB && rowsB == rowsC) // identical answers
      info(f"agg=$a%d B, inferred-window=$b%d B, naive-window=$c%d B " +
        f"(naive/agg = ${c.toDouble / a}%.0fx)")
      assert(a < c / 100, s"agg $a not ≪ naive $c")
      assert(b < c / 100, s"inferred $b not ≪ naive $c")
      assert(a < 4 * b, s"agg $a not within 4x of inferred $b")
    } finally {
      spark.conf.set(aqe, prevAqe)
      prevExcl match {
        case Some(v) => spark.conf.set(excl, v)
        case None => spark.conf.unset(excl)
      }
    }
  }

  test("null/garbage ord or id rows are dropped, not crashed on") {
    val df = Seq(("g", "10", 1L), ("g", "junk", 2L), ("g", null, 3L),
      ("g", "7", 4L)).toDF("g", "v", "id")
    val got = TopK.perGroup(df, Seq(col("g")), col("v"), col("id"), 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }
}
