package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Buckets, Dedup, EventWeights, TimeFeatures}
import graft.schema.Schemas

/** Bronze→silver transforms (SURVEY §2.2, §2.5, §2.6 — the reference's
  * `main_pipeline.py:201-362` re-expressed as declarative
  * `DataFrame => DataFrame` functions).
  *
  * Each transform is one Project/Filter/Window chain: Catalyst pushes
  * the required-field and enum filters into the scan, and the window
  * ops shuffle once on their partition key. Nothing here collects to
  * the driver, so the same code runs at any scale.
  */
object Silver {

  /** Clickstream cleaning + feature engineering
    * (`main_pipeline.py:201-263`):
    * normalize variants → required-field filter (P1) → ts coerce (P2) →
    * enum whitelist (P4) → dedup by event_id (D1) → time features
    * (P6–P8) → event weight (P11) → mobile flag (P12) → price tier
    * (P13) → session sequence (W1) → flags (P19) → purchase value
    * (P20) → processing metadata (P25).
    */
  def clickstream(bronze: DataFrame): DataFrame = {
    val normalized = bronze
      .withColumn("product_id", coalesce(col("product_id"), col("item_id")))
      .withColumn("product_category",
        coalesce(col("product_category"), col("category")))
      .withColumn("product_price", coalesce(col("product_price"), col("price")))
      .withColumn("page_url", coalesce(col("page_url"), col("url")))
      .withColumn("event_type", Schemas.normalizeEventType(col("event_type")))
      .drop("item_id", "category", "price", "url")

    val cleaned = normalized
      .withColumn("ts", Schemas.parseTs(col("timestamp")))
      .na.drop(Seq("user_id", "product_id", "event_type"))
      .filter(col("ts").isNotNull)
      .filter(col("event_type").isin(
        "view", "click", "add_to_cart", "purchase", "remove_from_cart",
        "search", "recommendation_clicked"))

    // D1 with a PINNED survivor (not dropDuplicates, which keeps a
    // partition-layout-dependent arbitrary row — the A8 bug class the
    // users/products transforms already guard against): same-id rows
    // order by a content hash, and null-id rows pass through untouched
    // (dropDuplicates would collapse ALL null ids into one survivor).
    val typed = cleaned.filter(col("event_id").isNull).unionByName(
      Dedup.keepLatestBy(cleaned.filter(col("event_id").isNotNull),
        Seq("event_id"),
        Seq(xxhash64(cleaned.columns.toIndexedSeq.map(col): _*).desc)))

    val wSession = Window.partitionBy(col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    typed
      .withColumn("hour", TimeFeatures.hourOfDay(col("ts")))
      .withColumn("day_of_week", TimeFeatures.dayName(col("ts")))
      .withColumn("is_weekend", TimeFeatures.isWeekend(col("ts")))
      .withColumn("event_weight",
        EventWeights.weight(col("event_type"), EventWeights.reference))
      .withColumn("is_mobile",
        coalesce(lower(col("device_type")).isin("mobile", "tablet"),
          lit(false)))
      .withColumn("price_tier", Buckets.priceTier(col("product_price")))
      .withColumn("session_sequence", row_number().over(wSession))
      .withColumn("is_purchase", col("event_type") === "purchase")
      .withColumn("is_view", col("event_type") === "view")
      .withColumn("is_cart_add", col("event_type") === "add_to_cart")
      .withColumn("purchase_value",
        when(col("is_purchase"),
          coalesce(col("product_price"), lit(0.0)) *
            coalesce(col("quantity"), lit(1)))
          .otherwise(lit(0.0)))
      .withColumn("date", to_date(col("ts")))
      .withColumn("silver_processed_at", current_timestamp())
  }

  /** User-profile cleaning (`main_pipeline.py:265-311`):
    * required (P1) → ts coerce (P2) → numeric coerce (P3) → value
    * segment (P14) → account age (P18) → CLV (P23) → customer segment
    * (P22) → keep-latest per user (D2, deterministic window form). */
  def users(bronze: DataFrame): DataFrame = {
    val typed = bronze
      .withColumn("ts", Schemas.parseTs(col("timestamp")))
      .na.drop(Seq("user_id"))
      .filter(col("ts").isNotNull)
      .withColumn("age", col("age").cast("double"))
      .withColumn("total_purchases", col("total_purchases").cast("double"))
      .withColumn("total_spent", col("total_spent").cast("double"))

    // D2 keep-latest with a PINNED tie-break: profile snapshots carry
    // no unique event id, so same-timestamp rows order by a content
    // hash of the raw record — any stable total order works, it just
    // must not depend on partition layout (the A8 bug class; r2
    // verdict What's-wrong #5). MedallionSpec asserts repartition(1)
    // and repartition(32) produce identical silver.
    val derived = typed
      .withColumn("value_segment", Buckets.valueSegment(col("total_spent")))
      .withColumn("account_age_days",
        TimeFeatures.accountAgeDays(Schemas.parseTs(col("created_at"))))
      .withColumn("customer_lifetime_value",
        coalesce(col("avg_order_value"), lit(0.0)) *
          coalesce(col("total_purchases"), lit(0.0)))
      .withColumn("customer_segment",
        Buckets.customerSegment(col("total_purchases"),
          col("avg_order_value")))
    Dedup.keepLatestBy(derived, Seq("user_id"),
        Seq(col("ts").desc, xxhash64(typed.columns.toIndexedSeq.map(col): _*).desc))
      .withColumn("date", to_date(col("ts")))
      .withColumn("silver_processed_at", current_timestamp())
  }

  /** Product-catalog cleaning (`main_pipeline.py:313-362`):
    * required (P1) → ts coerce (P2) → price coerce + positive filter
    * (P3, P5) → category standardization (P16) → stock flag (P17) →
    * price tier (P13 alt bins) → rating category (P21) → keep-latest
    * per product (D2). */
  def products(bronze: DataFrame): DataFrame = {
    val typed = bronze
      .withColumn("ts", Schemas.parseTs(col("timestamp")))
      .na.drop(Seq("product_id"))
      .filter(col("ts").isNotNull)
      .withColumn("price", col("price").cast("double"))
      .withColumn("stock_quantity", col("stock_quantity").cast("int"))
      .filter(col("price") > 0)

    // Same pinned tie-break as `users` — see the comment there.
    val derived = typed
      .withColumn("category", initcap(trim(col("category"))))
      .withColumn("is_in_stock",
        coalesce(col("stock_quantity") > 0, lit(false)))
      .withColumn("price_tier",
        Buckets.cut(col("price"), 0, Seq(25, 100, 300),
          Seq("budget", "mid", "premium", "luxury")))
      .withColumn("rating_category",
        Buckets.ratingCategory(coalesce(col("rating"), col("avg_rating"))))
    Dedup.keepLatestBy(derived, Seq("product_id"),
        Seq(col("ts").desc, xxhash64(typed.columns.toIndexedSeq.map(col): _*).desc))
      .withColumn("date", to_date(col("ts")))
      .withColumn("silver_processed_at", current_timestamp())
  }
}
