package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK
import graft.functions.TopK.TopKBuf

/** Bounded top-k aggregate: exact under any partitioning/merge tree,
  * deterministic tie-breaks, bottom-k mode as the hash-priority
  * reservoir, garbage-input tolerance. */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  test("buffer keeps the k best and evicts deterministically") {
    val b = new TopKBuf(3)
    Seq((5L, 1L), (1L, 2L), (3L, 3L), (1L, 1L), (9L, 9L))
      .foreach(b.insert)
    // ascending (key, id): (1,1) (1,2) (3,3) survive; (5,1) (9,9) out
    assert(b.set.toSeq == Seq((1L, 1L), (1L, 2L), (3L, 3L)))
  }

  test("merge-tree independence: split buffers equal one flat buffer") {
    val xs = (0 until 500).map(i =>
      (((i * 2654435761L) % 101), i.toLong))
    val flat = new TopKBuf(7); xs.foreach(flat.insert)
    val parts = xs.grouped(13).map { chunk =>
      val p = new TopKBuf(7); chunk.foreach(p.insert); p
    }.toSeq
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.set.toSeq == flat.set.toSeq)
  }

  test("perGroup top-k matches a window over any partitioning") {
    val df = (1 to 200).map(i =>
      (s"g${i % 3}", (i * 37 % 50).toLong, i.toLong))
      .toDF("g", "v", "id").repartition(7)
    val got = TopK.perGroup(df, Seq(col("g")), col("v"), col("id"), 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 4)
      .select("g", "rnk", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("bottom-k with a hash priority is a deterministic reservoir") {
    val df = (1 to 100).map(i => ("s", i.toLong)).toDF("g", "id")
      .withColumn("pri", graft.curation.Curation.contentU32(col("id")))
    val a = TopK.perGroup(df.repartition(2), Seq(col("g")), col("pri"),
      col("id"), 5, largest = false).select("id").as[Long].collect().toSet
    val b = TopK.perGroup(df.repartition(11), Seq(col("g")), col("pri"),
      col("id"), 5, largest = false).select("id").as[Long].collect().toSet
    assert(a == b && a.size == 5)
  }

  test("null/garbage ord or id rows are dropped, not crashed on") {
    val df = Seq(("g", "10", 1L), ("g", "junk", 2L), ("g", null, 3L),
      ("g", "7", 4L)).toDF("g", "v", "id")
    val got = TopK.perGroup(df, Seq(col("g")), col("v"), col("id"), 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }
}
