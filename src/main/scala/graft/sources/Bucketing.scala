package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY §2.7 scale note / J5): the
  * fact-fact join strategy when both sides are large and the join is
  * recurring. Writing both tables bucketed (and sorted) by the join
  * key lets every subsequent join run with NO shuffle exchange on
  * either side — each bucket pair joins locally, which at 100 TB is
  * the difference between an hourly job that reshuffles the world and
  * one that streams matched buckets.
  *
  * This is deliberately catalog-based (`saveAsTable`): bucket metadata
  * lives in the table catalog, which is what lets Catalyst elide the
  * exchange. Plain-path parquet cannot carry bucket info.
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] made idempotent ACROSS sessions: a managed
    * table's files survive the JVM but the in-memory catalog does
    * not, so a later session's Overwrite fails with
    * LOCATION_ALREADY_EXISTS on the orphaned directory. Drop the
    * catalog entry if present AND clear the stale location, then
    * write. */
  def replaceBucketed(spark: SparkSession, df: DataFrame, table: String,
                      key: String, buckets: Int): Unit = {
    // The orphan-directory cleanup below reconstructs the managed
    // location as <warehouse>/<table> — valid ONLY for a simple name
    // in the default database with the default catalog layout. A
    // qualified name (db.tbl) would resolve to the wrong path and the
    // delete could miss the orphan (write still fails) or hit an
    // unintended directory, so refuse it loudly.
    require(!table.contains("."),
      s"replaceBucketed requires a simple unqualified table name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    writeBucketed(df, table, key, buckets)
  }

  /** Join two bucketed catalog tables on their bucket key. With equal
    * bucket counts the physical plan contains no ShuffleExchange on
    * either side (asserted by BucketingSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
