package graft

import org.apache.spark.sql.functions._

/** q360 encoding-selection census — driver-side third implementation
  * (the engine runs keyed windows + censuses, the DuckDB oracle runs
  * the same set arithmetic; this replays the three declared encoding
  * models with plain Scala loops over the collected table, so a
  * shared blind spot in the set formulation can't hide). */
class EncodingSpec extends SparkSpec {

  test("q360 equals the naive per-column encoding cost replay") {
    val sf = "/root/testdata/sf0.001"
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "l_suppkey", "l_partkey")
      .collect()
    val cols: Seq[(String, Int => (String, Long))] = Seq(
      "l_returnflag" -> ((i: Int) => {
        val v = rows(i).getString(2); (v, 8L * v.length)
      }),
      "l_linestatus" -> ((i: Int) => {
        val v = rows(i).getString(3); (v, 8L * v.length)
      }),
      "l_suppkey" -> ((i: Int) => (rows(i).getLong(4).toString, 64L)),
      "l_partkey" -> ((i: Int) => (rows(i).getLong(5).toString, 64L)))
    def bitlen(x: Long): Long =
      64L - java.lang.Long.numberOfLeadingZeros(math.max(1L, x))
    val got = graft.queries.CoreQueries.q360.run(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == cols.map(_._1).toSet)
    for ((cname, f) <- cols) {
      // declared layout: (l_orderkey, l_linenumber, value)
      val vals = rows.indices
        .map(i => (rows(i).getLong(0), rows(i).getInt(1), f(i)))
        .sortBy { case (ok, ln, (v, _)) => (ok, ln, v) }
      var runs = 0L; var rleBits = 0L; var plain = 0L
      var prevKey = -1L; var prevV: String = null
      for ((ok, _, (v, pb)) <- vals) {
        plain += pb
        if (ok != prevKey || v != prevV) { runs += 1; rleBits += pb + 32 }
        prevKey = ok; prevV = v
      }
      val distinct = vals.map(_._3).distinct
      val d = distinct.size.toLong
      val dictBits = vals.size * bitlen(math.max(1L, d - 1)) +
        distinct.map(_._2).sum
      val r = got(cname)
      assert(r.getLong(1) == vals.size && r.getLong(2) == d &&
        r.getLong(3) == runs && r.getLong(4) == plain &&
        r.getLong(5) == dictBits && r.getLong(6) == rleBits,
        s"$cname: got ${r.mkString(",")} want " +
          s"(${vals.size},$d,$runs,$plain,$dictBits,$rleBits)")
      val best =
        if (plain <= dictBits && plain <= rleBits) "plain"
        else if (dictBits <= rleBits) "dict" else "rle"
      assert(r.getString(7) == best, s"$cname best")
    }
  }
}
