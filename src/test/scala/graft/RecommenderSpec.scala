package graft

import org.apache.spark.sql.functions._

import graft.ml.Recommender

class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  // 4 users, 4 items: u1/u2 like A+B, u3/u4 like C+D
  private def interactions = Seq(
    (1, 10, 5.0), (1, 11, 4.0), (2, 10, 4.0), (2, 11, 5.0),
    (3, 12, 5.0), (3, 13, 4.0), (4, 12, 4.0), (4, 13, 5.0),
    (1, 12, 0.5), (3, 10, 0.5))
    .toDF("u", "i", "w")

  test("implicitRatings aggregates weights per user-item") {
    val r = Recommender.implicitRatings(
      interactions.union(interactions), "u", "i", col("w"))
    assert(r.count() == 10)
    assert(r.filter(col("user") === 1 && col("item") === 10)
      .head().getFloat(2) == 10.0f)
  }

  test("ALS trains, is seed-deterministic, and ranks co-cluster items") {
    val ratings = Recommender.implicitRatings(interactions, "u", "i",
      col("w"))
    val m1 = Recommender.als(ratings)
    val recs = Recommender.recommendations(m1, 4)
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(-_.getFloat(2)).map(_.getInt(1)).toSeq)
      .toMap
    // u1's top-2 should be the items its cluster engages with
    assert(recs(1).take(2).toSet == Set(10, 11))
    assert(recs(3).take(2).toSet == Set(12, 13))
    // same seed -> identical scores
    val m2 = Recommender.als(ratings)
    val s1 = Recommender.recommendations(m1, 2).collect().map(_.toSeq).toSet
    val s2 = Recommender.recommendations(m2, 2).collect().map(_.toSeq).toSet
    assert(s1 == s2)
    assert(Recommender.rmse(m1, ratings) < 5.0)
  }

  test("maxBasketFromHistogram: keeps all under budget, caps when it binds") {
    val baskets = Seq(
      (100, "A"), (100, "B"), (100, "C"), // size 3 → 6 ordered pairs
      (101, "A"), (101, "B"),             // size 2 → 2
      (102, "A"), (102, "B")).toDF("b", "i") // size 2 → 2
    // generous budget: cap = max observed size, nothing dropped
    assert(Recommender.maxBasketFromHistogram(baskets, "b", "i") == 3)
    // budget 4: both size-2 baskets fit (4 pairs); size 3 would bust
    assert(Recommender.maxBasketFromHistogram(baskets, "b", "i",
      pairBudget = 4L) == 2)
    // budget below anything: floor cap of 1 (singleton baskets only)
    assert(Recommender.maxBasketFromHistogram(baskets, "b", "i",
      pairBudget = 1L) == 1)
  }

  test("capAndMaxObserved: no-op-elide signal vs binding cap") {
    val baskets = Seq(
      (100, "A"), (100, "B"), (100, "C"),
      (101, "A"), (101, "B"),
      (102, "A"), (102, "B")).toDF("b", "i")
    // generous budget: cap == max observed — a caller's cap filter is
    // a provable no-op and may be elided (the q219 fast path)
    assert(Recommender.capAndMaxObserved(baskets, "b", "i") == ((3, 3L)))
    // binding budget: cap < max observed — the filter MUST run
    val (cap, maxObs) =
      Recommender.capAndMaxObserved(baskets, "b", "i", pairBudget = 4L)
    assert(cap == 2 && maxObs == 3L && cap < maxObs)
  }

  test("serveTopK scores via dot product, drops seen pairs, caps at k") {
    val uf = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("usr", "fu")
    val itf = Seq((10L, Seq(3.0, 0.0)), (11L, Seq(2.0, 0.0)),
      (12L, Seq(0.0, 5.0)), (13L, Seq(1.0, 1.0))).toDF("item", "fi")
    val seen = Seq((1L, 10L)).toDF("usr", "item")
    val out = Recommender.serveTopK(uf, itf, seen, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    // user 1: item 10 (score 3) is seen and excluded; top-2 of the
    // rest is 11 (2) then 13 (1)
    assert(out.filter(_._1 == 1L).sortBy(_._2).toSeq ==
      Seq((1L, 1, 11L, 2L), (1L, 2, 13L, 1L)))
    // user 2: 12 (5) then 13 (1); k=2 drops the zero-score tail
    assert(out.filter(_._1 == 2L).sortBy(_._2).toSeq ==
      Seq((2L, 1, 12L, 5L), (2L, 2, 13L, 1L)))
  }

  test("coOccurrence counts shared baskets and caps basket size") {
    val baskets = Seq(
      (100, "A"), (100, "B"), (100, "C"),
      (101, "A"), (101, "B"),
      (102, "A"), (102, "B")).toDF("b", "i")
    val co = Recommender.coOccurrence(baskets, "b", "i")
    val ab = co.filter(col("item") === "A" && col("co_item") === "B")
      .head().getLong(2)
    assert(ab == 3)
    val top = Recommender.topCoItems(co, 1)
      .filter(col("item") === "A").head()
    assert(top.getAs[String]("co_item") == "B")
    // cap: basket 100 has 3 items; maxBasket=2 drops it entirely
    val capped = Recommender.coOccurrence(baskets, "b", "i", maxBasket = 2)
    assert(capped.filter(col("item") === "A" && col("co_item") === "C")
      .count() == 0)
  }
}
