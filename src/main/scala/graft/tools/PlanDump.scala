package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for named registry queries to
  * files — the before/after plan evidence an optimization round
  * commits (plans/rNN/<query>_{before,after}.txt). Planning only; no
  * job runs, so this is safe to use while other work is in flight.
  *
  * Usage: graft.tools.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  * writes <outDir>/<qname>_<suffix>.txt for each named query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.local.dir", graft.app.JobSession.localScratch)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = graft.SparkEntry.queries
    names.foreach { n =>
      val out = outDir.resolve(s"${n}_$suffix.txt")
      try {
        // NOTE: some queries run driver-side probes (histogram collects,
        // checkpoints) during PLAN CONSTRUCTION — building the frame may
        // run small jobs; the explain itself does not execute the query.
        val df = fns(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(out, txt)
        System.err.println(s"[plandump] wrote $out")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] FAILED $n: ${e.getMessage}")
      }
      graft.Bench.releaseAll(spark)
    }
    spark.stop()
  }
}
