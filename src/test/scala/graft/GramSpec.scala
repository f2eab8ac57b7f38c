package graft

import org.apache.spark.sql.functions._

import graft.functions.Gram

/** [[graft.functions.Gram.moments]] — the one-pass typed moment
  * census that replaced the chained double-posexplode in q310/q316.
  * Pins: bit-identical sums vs the explode shape (the form it
  * replaced), partitioning independence (long sums commute), symmetry
  * of the mirrored Gram output, and the loud ragged-array failure
  * (the SqDistLong lesson: never a plausible partial census). */
class GramSpec extends SparkSpec {

  private val D = 5

  // deterministic signed grid vectors, several groups, odd row count
  private lazy val vecs = {
    import spark.implicits._
    (1 to 37).map { i =>
      (i % 3L, (0 until D).map(j => ((i * 31 + j * 17) % 23 - 11).toLong))
    }.toDF("g", "ku")
  }

  private def explodeForm: Map[(Long, Int, Int), Long] =
    vecs.select(col("g"), col("ku"),
        posexplode(col("ku")).as(Seq("p", "kp")))
      .select(col("g"), col("p"), col("kp"),
        posexplode(col("ku")).as(Seq("q", "kq")))
      .groupBy(col("g"), col("p"), col("q"))
      .agg(sum(col("kp") * col("kq")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap

  private def momentRows(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(Gram.moments(col("ku"), D).as("mm"))
      .select(col("g"), col("mm._1").as("s1"), col("mm._2").as("s2"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toVector, r.getSeq[Long](2).toVector))
      .toMap

  test("Gram matrix equals the double-posexplode census, per group") {
    val want = explodeForm
    val got = momentRows(vecs)
    for (((g, (_, s2))) <- got; p <- 0 until D; q <- 0 until D)
      assert(s2(p * D + q) == want((g, p, q)),
        s"g=$g p=$p q=$q")
  }

  test("first moment equals the single-posexplode sums") {
    val want = vecs.select(col("g"), posexplode(col("ku")).as(Seq("p", "k")))
      .groupBy(col("g"), col("p")).agg(sum(col("k")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((g, (s1, _)) <- momentRows(vecs); p <- 0 until D)
      assert(s1(p) == want((g, p)), s"g=$g p=$p")
  }

  test("partitioning-independent (exact long sums commute)") {
    assert(momentRows(vecs.repartition(1)) ==
      momentRows(vecs.repartition(7, col("ku"))))
  }

  test("output Gram is symmetric") {
    for ((g, (_, s2)) <- momentRows(vecs); p <- 0 until D; q <- 0 until D)
      assert(s2(p * D + q) == s2(q * D + p), s"g=$g p=$p q=$q")
  }

  test("ragged vector fails loudly, never a partial census") {
    import spark.implicits._
    val ragged = Seq((0L, Seq(1L, 2L, 3L, 4L, 5L)), (0L, Seq(1L, 2L)))
      .toDF("g", "ku")
    val ex = intercept[Exception] {
      ragged.groupBy(col("g"))
        .agg(Gram.moments(col("ku"), D).as("mm")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("expected dimension"))))
  }
}
