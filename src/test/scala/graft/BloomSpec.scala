package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def fact = spark.range(0, 1000)
    .select(col("id").as("k"), (col("id") % 7).as("v"))
  private def dim = spark.range(0, 1000)
    .filter(col("id") % 10 === 0) // 10% of keys match
    .select(col("id").as("dk"), lit("d").as("tag"))

  test("bloomFilteredJoin is row-identical to the plain join") {
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "tag").collect().map(_.toString).sorted
    val bloomed = GraftBloom
      .bloomFilteredJoin(fact, dim, "k", "dk",
        expectedItems = 1L << 10, numBits = 1L << 14)
      .select("k", "v", "tag").collect().map(_.toString).sorted
    assert(bloomed.sameElements(plain))
  }

  test("bloom pre-screen has no false negatives and drops most rows") {
    val bits = GraftBloom.buildBloom(dim, "dk",
      expectedItems = 1L << 10, numBits = 1L << 14).get
    val screened = fact.filter(GraftBloom.mightContain(bits, col("k")))
    val kept = screened.select("k").as[Long].collect().toSet
    val trueKeys = dim.select("dk").as[Long].collect().toSet
    // no false negatives: every real key survives the screen
    assert(trueKeys.subsetOf(kept))
    // selectivity: with 2^14 bits over 100 items the fp rate is ~0 —
    // the screen should keep roughly the 100 true keys, not the 1000
    assert(kept.size < 200, s"bloom kept ${kept.size} of 1000")
  }

  test("empty dim yields an empty join, not a crash") {
    val empty = dim.filter(lit(false))
    val out = GraftBloom.bloomFilteredJoin(fact, empty, "k", "dk")
    assert(out.count() == 0)
  }

  test("might_contain sits on the fact side of the executed plan") {
    val out = GraftBloom.bloomFilteredJoin(fact, dim, "k", "dk",
      expectedItems = 1L << 10, numBits = 1L << 14)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
