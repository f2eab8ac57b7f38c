package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.AsOf

/** [[graft.functions.AsOf.asofJoin]] — semantics pinned against a naive
  * per-row computation, plus the tie/strictness/null-key corners a
  * window-based implementation can silently get wrong. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    // (id, key, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
    (4L, "b", 15L), (5L, "b", 5L),
    (6L, "c", 50L),               // key with no right rows
    (7L, null.asInstanceOf[String], 100L) // null key never matches
  ).toDF("id", "key", "t")

  private def right = Seq(
    ("a", 10L, 100.0), ("a", 25L, 200.0),
    ("b", 15L, 300.0),
    (null.asInstanceOf[String], 1L, 999.0) // null-key right row: invisible
  ).toDF("key", "rt", "payload")

  test("strict as-of excludes same-instant right rows") {
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", "rt",
        Seq("payload"), strict = true)
      .orderBy("id").select("id", "payload").collect()
    assert(out.toSeq == Seq(
      Row(1L, null),   // t=10: right@10 NOT visible under strict >
      Row(2L, 100.0),  // t=20: right@10
      Row(3L, 200.0),  // t=30: right@25 (latest earlier, not first)
      Row(4L, null),   // t=15: right@15 excluded under strict
      Row(5L, null),   // t=5: nothing earlier
      Row(6L, null),   // no right rows for key c
      Row(7L, null)))  // null key: right null-key row must NOT leak in
  }

  test("non-strict as-of includes same-instant right rows") {
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", "rt",
        Seq("payload"), strict = false)
      .orderBy("id").select("id", "payload").collect()
    assert(out.toSeq == Seq(
      Row(1L, 100.0), Row(2L, 100.0), Row(3L, 200.0),
      Row(4L, 300.0), Row(5L, null), Row(6L, null), Row(7L, null)))
  }

  test("payload columns are carried atomically from the same right row") {
    val r2 = right.withColumn("payload2", col("payload") * 10)
    val out = AsOf.asofJoin(left, r2, Seq("key"), "t", "rt",
        Seq("payload", "payload2"), strict = true)
      .filter(col("payload").isNotNull)
      .select("payload", "payload2").collect()
    assert(out.nonEmpty &&
      out.forall(r => r.getDouble(1) == r.getDouble(0) * 10))
  }

  test("partition-order independence (repartition 1 vs 32)") {
    def run(n: Int) = AsOf.asofJoin(
        left.repartition(n), right.repartition(n), Seq("key"), "t", "rt",
        Seq("payload"), strict = true)
      .orderBy("id").collect().toSeq
    assert(run(1) == run(32))
  }

  test("randomized differential: asofJoin == naive per-row max scan") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val strict = trial % 2 == 0
      val lRows = Seq.tabulate(200)(i =>
        (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong))
      // duplicate right (key, t) would be ill-defined — dedup in gen
      val rRows = Seq.fill(150)(
        (s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong, rnd.nextDouble()))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val got = AsOf.asofJoin(
          lRows.toDF("id", "key", "t"), rRows.toDF("key", "rt", "payload"),
          Seq("key"), "t", "rt", Seq("payload"), strict)
        .select("id", "payload").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val naive = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._1 == k &&
          (if (strict) r._2 < t else r._2 <= t))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got == naive, s"trial $trial strict=$strict")
    }
  }

  test("randomized differential: COMPOSITE keys (the q80 path)") {
    val rnd = new scala.util.Random(7)
    for (strict <- Seq(true, false)) {
      val lRows = Seq.tabulate(200)(i =>
        (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(3),
          rnd.nextInt(40).toLong))
      val rRows = Seq.fill(150)(
        (s"k${rnd.nextInt(4)}", rnd.nextInt(3), rnd.nextInt(40).toLong,
          rnd.nextDouble()))
        .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
      val got = AsOf.asofJoin(
          lRows.toDF("id", "k1", "k2", "t"),
          rRows.toDF("k1", "k2", "rt", "payload"),
          Seq("k1", "k2"), "t", "rt", Seq("payload"), strict)
        .select("id", "payload").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val naive = lRows.map { case (id, k1, k2, t) =>
        val cands = rRows.filter(r => r._1 == k1 && r._2 == k2 &&
          (if (strict) r._3 < t else r._3 <= t))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._3)._4))
      }.toMap
      assert(got == naive, s"strict=$strict")
    }
  }

  test("reserved internal column names are rejected, not overwritten") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "__tag")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "rt", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(ex.getMessage.contains("__tag"))
  }

  test("q51 window partitions by the join key (no global sort)") {
    val df = queries.CoreQueries.q51.run(spark, "/root/testdata/sf0.001")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty &&
      windows.forall(_.partitionSpec.nonEmpty))
  }
}
