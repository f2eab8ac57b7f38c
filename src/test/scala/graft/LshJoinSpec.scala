package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{LshBucketJoinExec, LshJoin}

/** The native LSH bucket self-join operator: same pairs as the
  * composed self-join, ONE shuffle in the plan, cap + null contracts. */
class LshJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(0)), (2L, Some(0)), (3L, Some(0)), // bucket 0: 3 pairs
    (4L, Some(1)), (5L, Some(1)),                // bucket 1: 1 pair
    (6L, Some(2)),                               // singleton: none
    (7L, None), (8L, None))                      // null bucket: none
    .toDF("id", "bucket")

  private def pairsOf(d: org.apache.spark.sql.DataFrame,
                      maxBucket: Int = 100000) =
    LshJoin.bucketPairs(d, "bucket", "id", maxBucket)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("bucketPairs equals the composed self-join, a_id < b_id") {
    val expected = df.as("x").join(df.as("y"),
      col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairsOf(df) == expected)
    assert(pairsOf(df) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("result is input-partitioning independent") {
    assert(pairsOf(df.repartition(1)) == pairsOf(df.repartition(13)))
  }

  test("maxBucket: oversized buckets emit no pairs (cap contract)") {
    assert(pairsOf(df, maxBucket = 2) == Seq((4L, 5L)))
  }

  test("plans exactly ONE bucket shuffle (composed self-join needs two)") {
    // exchanges are inserted by EnsureRequirements → inspect the
    // executedPlan (its pre-execution string shows the initial plan)
    def hashExchanges(p: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(p.queryExecution.executedPlan.toString).size
    val in = df.repartition(13)
    assert(hashExchanges(
      LshJoin.bucketPairs(in, "bucket", "id")) == 1)
    // the composed equivalent (forced off the tiny-data broadcast
    // path, which doesn't exist at scale) shuffles the same input for
    // BOTH join sides — two exchange nodes, possibly one reused
    val composed = in.as("x").hint("merge").join(in.as("y"),
      col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .queryExecution.executedPlan.toString
    assert(composed.contains("SortMergeJoin"), composed)
    val twoSided = "Exchange hashpartitioning".r.findAllIn(composed).size +
      "ReusedExchange".r.findAllIn(composed).size
    assert(twoSided == 2, composed)
  }

  test("carries payload columns through both sides") {
    val d = Seq((1L, 0, "x"), (2L, 0, "y")).toDF("id", "bucket", "p")
    val row = LshJoin.bucketPairs(d, "bucket", "id")
      .select("a_p", "b_p").head()
    assert((row.getString(0), row.getString(1)) == ("x", "y"))
  }
}
