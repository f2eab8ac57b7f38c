package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, MediaQueries, PipelineQueries, QualityQueries, QueryDef, RecommenderQueries, StreamQueries, TextQueries, TrainQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in `graft.queries.*` registries (one object per SURVEY §2
  * area), each carrying its own DuckDB oracle SQL when SQL-expressible.
  */
object SparkEntry {
  /** Registered query inventory (grows per round). */
  def registry: Seq[QueryDef] = {
    val all =
      CoreQueries.all ++ TextQueries.all ++ VectorQueries.all ++
        QualityQueries.all ++ RecommenderQueries.all ++
        MediaQueries.all ++ StreamQueries.all ++ PipelineQueries.all ++
        TrainQueries.all
    // fail LOUDLY on a name collision: `queries`/`oracleSql` build
    // Maps, and toMap keeps only the last entry — a copy-pasted name
    // would silently drop a query from Bench/Verify (one fewer
    // correctness row, nothing red)
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names in registry: ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join revenue rollup exercises scan→join→agg→sort end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q16.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
