package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"[prof] cpus=$cpus $name rows=$n in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
