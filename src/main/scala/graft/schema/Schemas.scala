package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topic schemas and the canonical event vocabulary (SURVEY §1.3–§1.4).
  *
  * The reference has two clickstream producer families with different
  * shapes (rich: `ecommerce_producers.py:115-146`; minimal:
  * `clickstream_producer.py` + seeded `test_clickstream.py:150-179`)
  * and three event-type vocabularies. The engine's single choke point
  * is: one *union* schema per topic (nullable), missing fields read as
  * nulls, plus one normalization projection — every downstream operator
  * assumes normalized columns. This replaces pandas' per-batch
  * `if col in df.columns` branching with fixed-schema null semantics
  * that Catalyst can constant-fold.
  */
object Schemas {

  /** Canonical event types (SURVEY §1.4). */
  val eventTypes: Seq[String] = Seq(
    "view", "click", "add_to_cart", "purchase", "remove_from_cart",
    "search", "recommendation_shown", "recommendation_clicked")

  /** Legacy → canonical event-type mapping
    * (`kafka_streams_processor.py:100`, `clisckstream_transformer.py:66`). */
  def normalizeEventType(c: Column): Column =
    when(c === "page_view", "view")
      .when(c === "product_click", "click")
      .otherwise(c)

  /** Clickstream union schema: rich ∪ minimal ∪ seeded variants.
    * (`ecommerce_producers.py:115-146`, `test_clickstream.py:150-179`) */
  val clickstream: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("timestamp", StringType), // parsed with coerce in silver
    StructField("session_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("product_id", StringType),
    StructField("item_id", StringType),   // minimal-variant alias
    StructField("product_category", StringType),
    StructField("category", StringType),  // minimal-variant alias
    StructField("product_price", DoubleType),
    StructField("price", DoubleType),     // minimal-variant alias
    StructField("quantity", IntegerType),
    StructField("total_amount", DoubleType),
    StructField("payment_method", StringType),
    StructField("device_type", StringType),
    StructField("browser", StringType),
    StructField("referrer", StringType),
    StructField("page_url", StringType),
    StructField("url", StringType),       // seeded-variant alias
    StructField("user_agent", StringType),
    StructField("ip_address", StringType),
    StructField("location", StringType),
    StructField("search_query", StringType),
    StructField("search_results_count", IntegerType),
    StructField("recommendation_algorithm", StringType),
    StructField("recommended_products", ArrayType(StringType))))

  /** User-profile union schema
    * (`ecommerce_producers.py:185-200` ∪ `producer.py:37-49`). */
  val user: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("timestamp", StringType),
    StructField("email", StringType),
    StructField("age", IntegerType),
    StructField("gender", StringType),
    StructField("location", StringType),
    StructField("signup_date", StringType),
    StructField("preferences", ArrayType(StringType)),
    StructField("total_orders", IntegerType),
    StructField("total_purchases", IntegerType),
    StructField("total_spent", DoubleType),
    StructField("avg_order_value", DoubleType),
    StructField("avg_session_duration", DoubleType),
    StructField("last_login", StringType),
    StructField("last_active", StringType),
    StructField("engagement_score", DoubleType),
    StructField("age_group", StringType),
    StructField("device_type", StringType),
    StructField("subscription_status", StringType),
    StructField("marketing_consent", BooleanType),
    StructField("created_at", StringType)))

  /** Product-catalog union schema
    * (`ecommerce_producers.py:237-258` ∪ `producer.py:60-74`). */
  val product: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("timestamp", StringType),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("subcategory", StringType),
    StructField("price", DoubleType),
    StructField("brand", StringType),
    StructField("rating", DoubleType),
    StructField("avg_rating", DoubleType),
    StructField("review_count", IntegerType),
    StructField("popularity_score", DoubleType),
    StructField("stock_quantity", IntegerType),
    StructField("in_stock", BooleanType),
    StructField("description", StringType),
    StructField("features", ArrayType(StringType)),
    StructField("weight", DoubleType),
    StructField("dimensions", StructType(Seq(
      StructField("length", DoubleType),
      StructField("width", DoubleType),
      StructField("height", DoubleType)))),
    StructField("availability", StringType),
    StructField("discount_percentage", IntegerType),
    StructField("tags", ArrayType(StringType)),
    StructField("last_updated", StringType)))

  /** Recommendation signal (`producer.py:84-104`). */
  val recommendationSignal: StructType = StructType(Seq(
    StructField("signal_id", StringType),
    StructField("user_id", StringType),
    StructField("product_id", StringType),
    StructField("algorithm", StringType),
    StructField("confidence_score", DoubleType),
    StructField("context", StructType(Seq(
      StructField("session_id", StringType),
      StructField("page_type", StringType),
      StructField("time_of_day", IntegerType),
      StructField("day_of_week", IntegerType)))),
    StructField("features", StructType(Seq(
      StructField("user_category_affinity", DoubleType),
      StructField("product_popularity", DoubleType),
      StructField("seasonal_factor", DoubleType),
      StructField("price_sensitivity", DoubleType)))),
    StructField("timestamp", StringType)))

  /** Timestamp parse policy (SURVEY §7 risk #4): the producers emit
    * both naive-local ISO (`ecommerce_producers.py:117`) and UTC-aware
    * ISO, parsed under the UTC session tz; unparseable → null,
    * matching `pd.to_datetime(errors='coerce')`. MUST be
    * `try_to_timestamp`: plain `to_timestamp` THROWS under ANSI mode
    * (the Spark 4 default), so one garbage timestamp string in a
    * bronze batch would kill the whole silver job instead of being
    * coerced to null and filtered (the Rules.timestampValid lesson
    * applied at the ingestion layer). */
  def parseTs(c: Column): Column = try_to_timestamp(c)
}
