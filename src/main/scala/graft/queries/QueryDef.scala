package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark plan plus (when SQL-expressible)
  * the ANSI-SQL oracle the driver runs in DuckDB over the same parquet.
  *
  * Parity rules (enforced by tools/check_oracle.py locally):
  *  - identical column names on both sides (driver sorts by name);
  *  - no raw timestamp outputs (parquet ns vs Spark µs precision);
  *  - double aggregates via [[graft.functions.Exact]] so accumulation
  *    order can't flip low bits;
  *  - any LIMIT/top-k fully ordered by a unique key chain.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(sql))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
