package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Analytics, Buckets, Exact}

/** Silver→gold aggregates (SURVEY §2.4 — the reference's
  * `gold_pipeline.py:168-339` as four groupBy plans off one cached
  * silver frame, plus the enrichment joins the reference loaded data
  * for but never implemented, J5).
  *
  * Scale: each table is a single-shuffle groupBy with map-side partial
  * aggregation; the mode computation (A3) is two-level (no per-key
  * sort, skew-safe); the daily conditional counts fold into the same
  * aggregation instead of the reference's extra join (A10).
  */
object Gold {

  /** A1–A4: user_summary (`gold_pipeline.py:168-221`). Expects silver
    * clickstream columns. */
  def userSummary(silver: DataFrame): DataFrame = {
    val base = silver.groupBy(col("user_id")).agg(
      count(col("ts")).as("total_events"),
      countDistinct(col("product_id")).as("products_viewed"),
      countDistinct(col("session_id")).as("total_sessions"),
      sum(col("event_weight")).as("total_engagement"),
      // money sums/avgs through the decimal accumulator (Exact.sumD):
      // a raw double sum is partition-order dependent, so the same
      // silver input could round differently across runs/retries —
      // event_weight is an int column, its long sum needs no such care
      Exact.round2(Exact.sumD(col("product_price")))
        .as("total_value_browsed"),
      Exact.round2(Exact.avgD(col("product_price")))
        .as("avg_price_interest"))
      .withColumn("events_per_session",
        round(col("total_events") /
          greatest(col("total_sessions"), lit(1)).cast("double"), 2))
      .withColumn("activity_level",
        Buckets.activityLevel(col("total_events")))
    // A3/A4: per-user modal device and category, deterministic
    // tie-break (modeDeterministic drops null values itself), joined
    // back on user_id — one row per user on each side, so this is a
    // plain keyed shuffle join that co-partitions with `base`, not a
    // broadcast candidate (the mode frame is |users|-sized).
    val dev = Analytics.modeDeterministic(
      silver, Seq("user_id"), "device_type", "preferred_device")
    val cat = Analytics.modeDeterministic(
      silver, Seq("user_id"), "product_category", "top_category")
    base.join(dev, Seq("user_id"), "left")
      .join(cat, Seq("user_id"), "left")
  }

  /** A5–A8: product_summary (`gold_pipeline.py:223-271`). */
  def productSummary(silver: DataFrame): DataFrame = {
    val base = silver.groupBy(col("product_id")).agg(
      countDistinct(col("user_id")).as("unique_viewers"),
      count(lit(1)).as("total_interactions"),
      countDistinct(col("session_id")).as("unique_sessions"),
      sum(col("event_weight")).as("total_engagement"),
      Exact.round2(Exact.avgD(col("product_price"))).as("avg_price"),
      // A8 with pinned ordering (SURVEY A8 ⚠): the category of the
      // LATEST event carrying one, ties broken by event_id — a bare
      // first(ignoreNulls) would be partition-order nondeterministic.
      // max_by skips rows whose ordering struct is null, which is how
      // null categories are ignored.
      max_by(col("product_category"),
        when(col("product_category").isNotNull,
          struct(col("ts"), col("event_id")))).as("category"))
      .withColumn("popularity_score",
        round(lit(0.5) * col("unique_viewers")
          + lit(0.3) * col("total_interactions")
          + lit(0.2) * col("total_engagement"), 2))
    // A7: quartile tiers over the aggregated (one-row-per-product)
    // frame — never ntile raw fact rows.
    Analytics.quartileTier(base, col("popularity_score"),
      col("product_id"), "popularity_tier")
  }

  /** A9–A10: daily_stats with the mobile count folded into the same
    * aggregation (`gold_pipeline.py:273-313`). */
  def dailyStats(silver: DataFrame): DataFrame =
    silver.groupBy(to_date(col("ts")).as("event_date")).agg(
      countDistinct(col("user_id")).as("daily_active_users"),
      countDistinct(col("product_id")).as("products_interacted"),
      countDistinct(col("session_id")).as("total_sessions"),
      count(lit(1)).as("total_events"),
      sum(col("event_weight")).as("total_engagement"),
      sum(when(col("is_mobile"), 1).otherwise(0)).as("mobile_events"))
      .withColumn("mobile_pct",
        round(lit(100.0) * col("mobile_events") / col("total_events"), 2))

  /** A11 + W6: engagement_metrics with global share
    * (`gold_pipeline.py:315-339`). The empty window runs over the
    * already-aggregated handful of rows — constant cost. */
  def engagementMetrics(silver: DataFrame): DataFrame =
    silver.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("unique_users"),
      count(lit(1)).as("event_count"),
      sum(col("event_weight")).as("total_engagement"))
      .withColumn("event_pct",
        round(lit(100.0) * col("event_count")
          / sum(col("event_count")).over(Window.partitionBy()), 2))

  /** J5: the star-schema enrichment the reference designed
    * (`project_structure.txt:74-84`) but never implemented — silver
    * clickstream joined to user and product dimensions. Dimensions are
    * broadcast (small sides by design: catalog/profile tables). */
  def enriched(clicks: DataFrame, users: DataFrame,
               products: DataFrame): DataFrame =
    clicks
      .join(broadcast(users.select(col("user_id"),
        col("value_segment"), col("customer_segment"))),
        Seq("user_id"), "left")
      .join(broadcast(products.select(col("product_id"),
        col("category").as("catalog_category"), col("price_tier")
          .as("catalog_price_tier"), col("rating_category"))),
        Seq("product_id"), "left")
}
