package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranks

/** Distributed rank family vs the single-partition window reference:
  * identical results on tie-heavy data, independent of input
  * partitioning and bucket count (the properties that make the
  * bucketed rewrite safe to substitute under q09/q12). */
class RanksSpec extends SparkSpec {

  // tie-heavy, unordered, negative + duplicate values; unique id
  private lazy val df = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 500).map(i => (i.toLong, (rnd.nextInt(40) - 10).toDouble))
      .toDF("id", "v")
      .repartition(7) // deliberately lumpy input partitioning
  }

  test("percentRank equals percent_rank().over(Window.orderBy)") {
    val expected = df.withColumn("p",
      percent_rank().over(Window.orderBy(col("v"))))
      .select("id", "p").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ranks.percentRank(df, col("v"), "p", buckets)
        .select("id", "p").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("ntileGlobal equals ntile(n).over(Window.orderBy) incl. N % n != 0") {
    for (n <- Seq(3, 4, 7); take <- Seq(499, 500)) {
      val d = df.filter(col("id") <= take)
      val expected = d.withColumn("t",
        ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranks.ntileGlobal(d, n, col("v"), col("id"), "t", 8)
        .select("id", "t").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"n=$n take=$take")
    }
  }

  test("ntileGlobal with fewer rows than tiles (q = 0 branch)") {
    val d = df.filter(col("id") <= 3)
    val got = Ranks.ntileGlobal(d, 4, col("v"), col("id"), "t")
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val expected = d.withColumn("t",
      ntile(4).over(Window.orderBy(col("v"), col("id"))))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got == expected)
  }

  test("rowNumberGlobal equals row_number().over(Window.orderBy)") {
    val expected = df.withColumn("i",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ranks.rowNumberGlobal(df, col("v"), col("id"), "i", buckets)
        .select("id", "i").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("pctRankPandas: average rank over count, tie-stable") {
    import spark.implicits._
    // v=1.0 twice (positions 1,2 -> avg 1.5), v=2.0 once (position 3)
    val d = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0)).toDF("id", "v")
    val got = Ranks.pctRankPandas(d, col("v"), "p")
      .select("id", "p").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5, 3L -> 1.0))
  }

  test("pctRankPandas: nulls get null pct and leave the denominator") {
    import spark.implicits._
    // pandas: [NaN, 1.0, 2.0].rank(pct=True) -> [NaN, 0.5, 1.0]
    val d = Seq((1L, Option.empty[Double]), (2L, Some(1.0)),
      (3L, Some(2.0))).toDF("id", "v")
    val rows = Ranks.pctRankPandas(d, col("v"), "p")
      .select("id", "p").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(0.5), 3L -> Some(1.0)))
  }

  test("prefixSum equals SUM over the global ROWS window") {
    import spark.implicits._
    // tie-heavy order key, independent value column
    val rnd = new scala.util.Random(11)
    val d = (1 to 400)
      .map(i => (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(50).toLong))
      .toDF("id", "v", "w")
      .repartition(5)
    val expected = d.withColumn("c",
      sum(col("w")).over(Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (buckets <- Seq(1, 4, 32)) {
      val got = Ranks.prefixSum(d, col("v"), col("id"), col("w"), "c",
        buckets)
        .select("id", "c").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("prefixSum NULL values follow SQL window semantics") {
    import spark.implicits._
    // leading all-null prefix -> NULL cum; later all-null LOCAL bucket
    // prefixes must still see earlier buckets' mass via the offset
    val d = Seq(
      (1L, 0L, Option.empty[Long]), (2L, 0L, None), (3L, 1L, Some(5L)),
      (4L, 2L, None), (5L, 3L, None), (6L, 3L, Some(2L)),
      (7L, 4L, None)).toDF("id", "v", "w")
    val expected = d.withColumn("c",
      sum(col("w")).over(Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "c").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    for (buckets <- Seq(1, 3, 7)) {
      val got = Ranks.prefixSum(d, col("v"), col("id"), col("w"), "c",
        buckets)
        .select("id", "c").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("prefixSum on a descending (negated) key matches ORDER BY DESC") {
    import spark.implicits._
    val d = Seq((1L, 5L, 10L), (2L, 5L, 20L), (3L, 9L, 1L), (4L, 2L, 7L))
      .toDF("id", "v", "w")
    val expected = d.withColumn("c",
      sum(col("w")).over(Window.orderBy(col("v").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.prefixSum(d, negate(col("v")), col("id"), col("w"),
      "c", 4)
      .select("id", "c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("release() frees the input cache the rank family pinned") {
    import org.apache.spark.storage.StorageLevel
    // other tests share this session: assert on the DELTA of cached
    // RDDs, not on an empty cache
    val before = spark.sparkContext.getPersistentRDDs.keySet
    import spark.implicits._
    // genuinely fresh plans: a select over the shared `df` would
    // sameResult its cached entry and release() would evict that
    val in = (1 to 200).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("id", "v")
    val out = Ranks.percentRank(in, col("v"), "p")
    out.count()
    // the persist-if-uncached contract pinned the CALLER's frame
    assert(in.storageLevel != StorageLevel.NONE)
    Ranks.release(in)
    assert(in.storageLevel == StorageLevel.NONE)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    Ranks.release(in) // idempotent no-op on an uncached frame
    // prefixSum shares the same contract + hook
    val in2 = (1 to 300).map(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "v")
    Ranks.prefixSum(in2, col("v"), col("id"), col("id"), "c").count()
    assert(in2.storageLevel != StorageLevel.NONE)
    Ranks.release(in2)
    assert(in2.storageLevel == StorageLevel.NONE)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
  }

  test("rowNumberPerKey equals row_number over PARTITION BY key") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // few keys, tie-heavy order values, unique tiebreak id
    val in = (1 to 400).map(i =>
      (i.toLong, (i % 4).toLong, rnd.nextInt(25).toLong))
      .toDF("id", "k", "v").repartition(9)
    val expected = in.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v"), col("id"))))
      .select("id", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1).toSeq
    for (buckets <- Seq(1, 5, 32)) {
      val got = Ranks.rowNumberPerKey(in, col("k"), col("v"),
          Seq(col("id")), "rn", buckets)
        .select("id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("results are partitioning-independent") {
    val a = Ranks.percentRank(df.repartition(1), col("v"), "p")
      .select("id", "p").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).toSeq
    val b = Ranks.percentRank(df.repartition(13), col("v"), "p")
      .select("id", "p").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
