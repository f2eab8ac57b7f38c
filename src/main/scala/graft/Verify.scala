package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 35+ distinct plans × several codegen units each blow through
      // the default 100-entry generated-class cache; thrash means
      // re-Janino-compiling large classes per query.
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // tmpfs scratch — see Bench.scala / NOTES_r2.md (disk stalls)
      .config("spark.local.dir", graft.app.JobSession.localScratch)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = Json.str(s)
    // oracle_sql.json is written BEFORE any query runs: the checker
    // compares whichever per-query parquet dirs exist against this map,
    // so a timeout mid-loop now yields partial correctness evidence
    // instead of zeroing the round (CORRECTNESS_r02 was {} because this
    // file used to be written last and the run was killed first).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query watchdog: one pathological query must never hang the
    // whole dump (each result parquet is independent evidence; the
    // oracle map above is already on disk). Generous default — the
    // goal is hang-prevention, not speed; a host storm must not kill
    // a healthy query.
    val timeoutSec = sys.env
      .getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong
    // Dev-only subset filter (comma-separated names); the driver never
    // sets it, so the full registry runs in a round.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      Watchdog.run(spark, name, timeoutSec) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case None =>
          System.err.println(
            f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        case Some(err) =>
          System.err.println(s"[verify] $name failed: $err")
      }
      // No query's persisted state may outlive it (Ranks persists its
      // rank input; SuffixRanks pins RDD-level checkpoint blocks the
      // catalog cache never sees; Bench clears the same way per query).
      Bench.releaseAll(spark)
    }
    spark.stop()
  }
}
