package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCH-ONLY stage-cost probe (round-12 optimization evidence): time
  * the building blocks of a named heavy query in isolation so the
  * optimization effort lands on the stage that actually dominates.
  * Never part of the driver surface; results go to stderr.
  */
object StageProbe {
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "q354"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.local.dir", graft.app.JobSession.localScratch)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    what match {
      case "q354" =>
        val docs = graft.Tables.documents(spark, sfDir)
        val docsIn = docs.select(col("doc_id").cast("long").as("doc"),
          col("text"))
        val r = timed("rankLevels(ordered) build+free") {
          graft.functions.SuffixRanks.ranks(docsIn, L = 64,
            ordered = true)
        }
        timed("ranks count")(r.count())
        val meta = docs.select(col("doc_id").as("doc"), col("source"),
          encode(col("text"), "UTF-8").as("bin"))
        val withB = r.join(broadcast(meta), Seq("doc"))
          .select(col("doc"), col("source"), col("i"), col("r"),
            when(col("i") === 0, lit(0)).otherwise(expr(
              "ascii(decode(substr(bin, cast(i as int) ,1), 'ISO-8859-1'))"))
              .as("bwt"))
        timed("bwt attach noop")(noop(withB))
        val wD = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc")).orderBy(col("r"), col("i"))
        timed("window+census") {
          noop(withB.withColumn("prev", lag(col("bwt"), 1).over(wD))
            .groupBy(col("source"))
            .agg(countDistinct(col("doc")).as("n_docs"),
              count(lit(1)).as("n_pos"),
              sum(when(col("prev").isNull || col("prev") =!= col("bwt"),
                1L).otherwise(0L)).as("n_runs")))
        }
        graft.Bench.releaseAll(spark)
      case "q354ranks" =>
        // per-phase breakdown of the ordered rank build itself
        val docs = graft.Tables.documents(spark, sfDir)
        val docsIn = docs.select(col("doc_id").cast("long").as("doc"),
          col("text"))
        (1 to 2).foreach { pass =>
          val levels = timed(s"pass$pass rankLevels(ordered) all") {
            graft.functions.SuffixRanks.rankLevels(docsIn, L = 64,
              ordered = true)
          }
          timed(s"pass$pass final count")(levels.last._2.count())
          graft.Bench.releaseAll(spark)
        }
      case "q219" =>
        val raw = graft.Tables.lineitem(spark, sfDir)
          .join(graft.Tables.orders(spark, sfDir),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
        val up0 = timed("up0 distinct ckpt") {
          graft.functions.Checkpoints.pin(
            raw.distinct().localCheckpoint())
        }
        timed("cap probe") {
          graft.ml.Recommender.capFromDistinct(up0, "u")
        }
        val ni = up0.groupBy(col("i")).agg(count(lit(1)).as("n"))
        timed("ni noop")(noop(ni))
        val pp = up0.as("a").join(up0.as("b"),
            col("a.u") === col("b.u") && col("a.i") < col("b.i"))
          .groupBy(col("a.i").as("x"), col("b.i").as("y"))
          .agg(count(lit(1)).as("c"))
        timed("pair census noop")(noop(pp))
        val sym = pp.select(col("x").as("i"), col("y").as("j"), col("c"))
          .unionByName(
            pp.select(col("y").as("i"), col("x").as("j"), col("c")))
        val sim = sym
          .join(ni.select(col("i"), col("n").as("na")), Seq("i"))
          .join(ni.select(col("i").as("j"), col("n").as("nb")), Seq("j"))
          .select(col("i"), col("j"), col("c"),
            expr("(1000000 * c * c) div (na * nb)").as("sim2_ppm"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("i")).orderBy(col("sim2_ppm").desc, col("j"))
        timed("full rest") {
          noop(sim.withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 3))
        }
        graft.Bench.releaseAll(spark)
      case _ => System.err.println(s"unknown probe $what")
    }
    spark.stop()
  }
}
