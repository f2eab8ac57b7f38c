package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (bench-only): does an eager localCheckpoint preserve
  * hash partitioning into downstream keyed ops, with/without AQE, and
  * does PartitionedCheckpoint fix it under AQE? */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val plain = (1 to 200000).map(i => (i % 37L, i.toLong)).toDF("b", "i")
      .distinct().repartition(col("b")).localCheckpoint()
    val stamped = org.apache.spark.sql.graft.PartitionedCheckpoint.byKey(
      (1 to 200000).map(i => (i % 37L, i.toLong)).toDF("b", "i")
        .distinct(), Seq("b"))
    for ((name, big) <- Seq("plain localCheckpoint" -> plain,
                            "PartitionedCheckpoint" -> stamped)) {
      println(s"=== $name (aqe=$aqe) rdd partitions=${big.rdd.getNumPartitions}")
      println("--- keyed agg on b")
      big.groupBy("b").count().explain("formatted")
      println("--- self-join on b")
      big.as("x").join(big.as("y"),
          col("x.b") === col("y.b") && col("x.i") =!= col("y.i"))
        .groupBy(col("x.i").as("item"), col("y.i").as("co"))
        .agg(count(lit(1)))
        .explain("formatted")
      println("--- window partitionBy b")
      big.withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
        .filter(col("n") <= 100).explain("formatted")
      // correctness cross-check: same census either way
      val c1 = big.groupBy("b").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"--- census sum ${c1.values.sum} keys ${c1.size}")
    }
    s.stop()
  }
}
