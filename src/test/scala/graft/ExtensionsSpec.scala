package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

import graft.functions.Skew

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* functions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql(
      "SELECT graft_simhash16(array('a','b','c')) AS s").head().getInt(0)
    assert(sh >= 0 && sh < 65536)
    val mh = spark.sql(
      "SELECT size(graft_minhash(array('x y z'))) AS n").head().getInt(0)
    assert(mh == 16)
    val fp = spark.sql(
      "SELECT graft_gram8_fingerprint('abcdefghij').n_distinct_grams AS n")
      .head().getInt(0)
    assert(fp == 3)
  }

  test("SelfDotRewrite: graft_dot(x, x) optimizes to graft_self_dot") {
    import graft.functions.Vectors
    // spark.range is a real source — a local Seq would be folded into
    // a LocalRelation at optimize time, hiding the rewrite
    val base = spark.range(1, 3)
      .select(array(col("id").cast("double"),
        (col("id") * 2).cast("double")).as("e"))
    val df = base.select(col("e"), Vectors.norm(col("e")).as("nrm"),
      Vectors.dot(col("e"), col("e")).as("sq"))
    // the rule (injected via spark.sql.extensions in SparkSpec) rewrote
    // the self-dot; a dot of distinct columns must NOT be rewritten
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_self_dot"), opt)
    val rows = df.collect()
    // e = [1,2] and [2,4]: sums of squares 5 and 20, bit-identical
    assert(rows.map(_.getDouble(2)).toSeq == Seq(5.0, 20.0))
    assert(rows.map(_.getDouble(1)).toSeq ==
      Seq(math.sqrt(5.0), math.sqrt(20.0)))
    val mixed = base.select(col("e").as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
      .select(Vectors.dot(col("a"), col("b")).as("d"))
    val optMixed = mixed.queryExecution.optimizedPlan.toString
    assert(!optMixed.contains("graft_self_dot"), optMixed)
    assert(mixed.collect().map(_.getDouble(0)).toSeq == Seq(11.0, 22.0))
  }

  test("salted aggregation equals direct aggregation on a hot key") {
    val rows = (1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => (s"k$i", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(df, "k", "v", buckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == direct)
  }

  test("salted join equals plain join on a hot key, row for row") {
    val big = ((1 to 500).map(i => (7L, i)) ++
      (1 to 20).map(i => (i.toLong, 1000 + i))).toDF("bk", "payload")
    val right = (1 to 30).map(i => (i.toLong, s"r$i")).toDF("rk", "attr")
    val plain = big.join(right, col("bk") === col("rk"))
      .select(col("bk"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq.sorted
    val salted = Skew
      .saltedJoin(big, right, "bk", "rk", buckets = 8, col("payload"))
      .select(col("bk"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq.sorted
    assert(salted == plain)
    // the hot key's rows really spread over multiple salt buckets
    val spread = big.filter(col("bk") === 7L)
      .select(Skew.salt(8, col("payload")).as("s"))
      .distinct().count()
    assert(spread > 1, s"hot key landed in $spread bucket(s)")
  }

  test("saltedJoin rejects reserved __salt columns") {
    val df = Seq((1L, 0)).toDF("k", "__salt")
    val other = Seq((1L, "x")).toDF("rk", "attr")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, other, "k", "rk", buckets = 4)
    }
  }

  test("salt is deterministic (safe under task retries)") {
    val df = Seq((1, 2.0), (1, 2.0)).toDF("a", "b")
      .select(Skew.salt(16, col("a"), col("b")).as("s"))
    val vals = df.collect().map(_.getInt(0))
    assert(vals(0) == vals(1) && vals(0) >= 0 && vals(0) < 16)
  }
}
