package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Every table is a single parquet file per scale factor; Spark splits it
  * into row-group-aligned input partitions automatically, so at 100 TB the
  * same call against a directory of many files parallelizes with no code
  * change. Column pruning and predicate pushdown happen at the scan because
  * all downstream operators stay declarative (no early `.collect`/`.rdd`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default. We read it as an exact ns long (`nanosAsLong`) and truncate
    * to a µs timestamp — exactly what DuckDB does on read (it coerces
    * timestamp_ns to µs `timestamp`), so both engines see identical
    * values. The exact ns long stays available as `ts_ns`.
    *
    * `spark.sql.legacy.parquet.nanosAsLong=true` must be set when the
    * session is BUILT (Bench / Verify / SparkSpec all do); a loader must
    * not mutate shared session conf as a side effect. We fail fast with
    * a clear message instead.
    */
  private def eventsNs(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "events.parquet uses TIMESTAMP(NANOS): build the SparkSession with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")
    load(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsNs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so the whole engine surface
    * is reachable from `spark.sql(...)` (with `events` carrying the
    * same ns→µs normalization as the typed loader). Catalyst plans a
    * SQL query over these views identically to the DataFrame form —
    * same pushdown, same join strategies (pinned by SqlSpec). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
