package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCH-ONLY scale-probe corpus generator (SCALING.md step-4 evidence).
  *
  * The driver tables stop at sf0.1 (~600 k lineitem rows); the heavy-tail
  * queries' cost models (q219 post-cap, q172, q239, q221, q202) therefore
  * have three-SF growth evidence ending one decade below where their
  * scale risk would first bite. This tool unions K key-disjoint copies of
  * the sf0.1 tables into a ~K× corpus under a scratch dir, so the bench
  * (never the oracle — this data is NOT driver-verifiable and must never
  * feed Verify) can add a step-4 growth column.
  *
  * Copy discipline — the growth measurement is only meaningful if each
  * copy preserves the original's per-copy structure while staying
  * disjoint from its siblings:
  *   - every int64 key family gets `+ k * KeyStride` (stride far above
  *     any sf0.1 key), applied consistently on both sides of each FK
  *     (custkey in customer+orders, orderkey in orders+lineitem,
  *     partkey in part+lineitem), so joins behave exactly as at sf0.1
  *     and graph/pair queries see K disjoint replicas — work scales
  *     linearly in rows, duplicate/pair structure per copy unchanged;
  *   - `documents.text` gets a per-copy Caesar rotation of the lowercase
  *     alphabet: lengths, token boundaries and WITHIN-copy repetition
  *     are preserved (so q172's duplicate census stays proportional),
  *     while no ≥2-char substring survives across copies (a verbatim 3×
  *     copy would cube the cross-doc match census and measure the dup
  *     blowup, not the scan growth);
  *   - `embeddings.embedding` gets a per-copy affine nudge
  *     (x*(1+k/1000) + k/10000): cluster geometry intact for the Lloyd
  *     step, vectors distinct so centroid updates don't degenerate.
  *   - region/nation/supplier are shared dimensions (copied verbatim):
  *     their keys are referenced un-shifted, mirroring how a real 100-TB
  *     fact scale-up leaves small dims fixed.
  *
  * Usage: graft.tools.ScaleProbe [srcDir] [outDir] [copies]
  * defaults: /root/testdata/sf0.1  /tmp/graft_scaleprobe/sf0.3x  3
  */
object ScaleProbe {
  private val KeyStride = 100000000L // 1e8 >> any sf0.1 key

  private val lower = "abcdefghijklmnopqrstuvwxyz"

  /** Caesar-rotate the lowercase alphabet by 7*k positions (7 is coprime
    * with 26, so every copy's mapping is a distinct bijection). */
  private def rot(col: org.apache.spark.sql.Column, k: Int) = {
    val shifted = lower.drop((7 * k) % 26) + lower.take((7 * k) % 26)
    translate(col, lower, shifted)
  }

  private def copyOf(df: DataFrame, k: Int, keyCols: Seq[String]): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * KeyStride)))

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String)(df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // shared dims: verbatim
    Seq("region", "nation", "supplier").foreach(t => write(t)(read(t)))

    def fanned(t: String, keys: Seq[String], extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(t)
      val parts = (0 until copies).map(k => extra(copyOf(base, k, keys), k))
      write(t)(parts.reduce(_ unionByName _))
    }

    fanned("customer", Seq("c_custkey"))
    fanned("part", Seq("p_partkey"))
    fanned("orders", Seq("o_orderkey", "o_custkey"))
    fanned("lineitem", Seq("l_orderkey", "l_partkey"))
    fanned("events", Seq("event_id", "user_id"))
    fanned("documents", Seq("doc_id"),
      (d, k) => if (k == 0) d else d.withColumn("text", rot(col("text"), k)))
    fanned("embeddings", Seq("vec_id"),
      (d, k) =>
        if (k == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"),
            x => (x * lit(1.0f + k / 1000.0f) + lit(k / 10000.0f)).cast("float"))))
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_scaleprobe/sf0.3x")
    val copies = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.app.JobSession.build("graft-scale-probe")
    try {
      generate(spark, src, out, copies)
      val n = spark.read.parquet(s"$out/lineitem.parquet").count()
      println(s"""{"out":"$out","copies":$copies,"lineitem_rows":$n}""")
    } finally spark.stop()
  }
}
