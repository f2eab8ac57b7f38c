package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas-`cut`-compatible bucketing (SURVEY §2.2 P13–P15, P21–P22).
  *
  * `pd.cut(x, [b0,b1,…], labels=[l1,…])` is right-closed/left-open:
  * x ∈ (b0,b1] → l1. Values ≤ b0 (or null) fall outside every bucket and
  * become null — the reference relies on this for price==0
  * (`main_pipeline.py:241-247`). Implemented as a `when` chain, which
  * Catalyst constant-folds and codegens.
  */
object Buckets {
  /** Right-closed cut: bounds are the inner edges; the last label covers
    * (bounds.last, ∞). `bounds.size == labels.size - 1`.
    */
  def cut(x: Column, lower: Double, bounds: Seq[Double],
          labels: Seq[String]): Column = {
    require(bounds.size == labels.size - 1,
      s"need ${bounds.size + 1} labels for ${bounds.size} inner bounds")
    val inRange = x.isNotNull && x > lower
    val chain = bounds.zip(labels).foldRight(lit(labels.last): Column) {
      case ((b, l), acc) => when(x <= b, l).otherwise(acc)
    }
    when(inRange, chain)
  }

  /** P13: price tiers, reference `main_pipeline.py:241-247`. */
  def priceTier(price: Column): Column =
    cut(price, 0, Seq(50, 200, 500, 1000),
      Seq("budget", "low", "mid", "high", "premium"))

  /** P14: customer value segments (`main_pipeline.py:290-295`); reference
    * fillna(0) first, and 0 falls outside (0,100] so stays null there too —
    * we preserve exactly that by coalescing before cutting.
    */
  def valueSegment(totalSpent: Column): Column =
    cut(coalesce(totalSpent, lit(0.0)), 0, Seq(100, 500, 1000, 5000),
      Seq("new", "low_value", "medium_value", "high_value", "premium"))

  /** P15: activity level (`gold_pipeline.py:198-202`). */
  def activityLevel(totalEvents: Column): Column =
    cut(totalEvents.cast("double"), 0, Seq(5, 15, 30),
      Seq("Low", "Medium", "High", "Very High"))

  /** P21: rating category (`product_features_transformer.py:56-61`) —
    * threshold chain, not a cut (left-closed at the top).
    */
  def ratingCategory(rating: Column): Column =
    when(rating >= 4.5, "excellent")
      .when(rating >= 4.0, "good")
      .when(rating >= 3.0, "average")
      .otherwise("poor")

  /** P22: customer segment (`user_features_transformer.py:60-73`) —
    * the reference's iterrows loop, vectorized.
    */
  def customerSegment(totalPurchases: Column, avgOrderValue: Column): Column =
    when(coalesce(totalPurchases, lit(0)) === 0, "new")
      .when(totalPurchases < 5, "occasional")
      .when(avgOrderValue > 200, "high_value")
      .otherwise("regular")
}
