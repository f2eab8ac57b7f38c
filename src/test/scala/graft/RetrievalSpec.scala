package graft

import graft.functions.Retrieval

/** BM25 integer scoring (q147's kernel): exact hand-computed values on
  * a fixture where every term of the formula is trivially derivable,
  * plus the three orderings the ranking function exists to produce —
  * tf saturation (monotone in tf), idf discrimination (rarer term
  * scores higher at equal tf), and length normalization (same tf,
  * longer doc scores lower). */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def score(docs: Seq[(Long, String)],
                    terms: Seq[String]): Map[Long, (Long, Long)] =
    Retrieval.bm25(docs.toDF("doc_id", "text"), terms)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hand-computed integer scores on the uniform-length fixture") {
    // N=4, every dl=2, total_len=8 -> norm_u = 250+(750*2*4)/8 = 1000,
    // denom = tf*1000 + 1200. Term 'a': df=2, idf = mnat(5)-mnat(2)
    // = 1609-693 = 916.
    val s = score(Seq(1L -> "a b", 2L -> "a a", 3L -> "b b",
      4L -> "c c"), Seq("a"))
    // tf=1: (916*1*2200000) div 2200 = 916000
    assert(s(1L) == (1L, 916000L))
    // tf=2: (916*2*2200000) div 3200 = 1259500
    assert(s(2L) == (1L, 1259500L))
    assert(!s.contains(3L) && !s.contains(4L)) // no match -> no row
  }

  test("tf saturation: monotone in tf, sublinear growth") {
    val s = score(Seq(1L -> "a x", 2L -> "a a", 3L -> "x x",
      4L -> "y y"), Seq("a"))
    val (s1, s2) = (s(1L)._2, s(2L)._2)
    assert(s2 > s1, s"tf=2 must beat tf=1: $s2 <= $s1")
    assert(s2 < 2 * s1, s"saturation: tf=2 must be < 2x tf=1: $s2")
  }

  test("idf: the rarer term outscores the common one at equal tf/dl") {
    // 'rare' df=1, 'com' df=3; doc 1 has both once at the same dl
    val s = score(Seq(1L -> "rare com", 2L -> "com x", 3L -> "com y"),
      Seq("rare", "com"))
    val rareOnly = score(Seq(1L -> "rare z", 2L -> "com x",
      3L -> "com y"), Seq("rare"))(1L)._2
    val comOnly = score(Seq(1L -> "com z", 2L -> "com x",
      3L -> "com y"), Seq("com"))(1L)._2
    assert(rareOnly > comOnly)
    assert(s(1L)._1 == 2L) // both terms matched
  }

  test("length normalization: same tf, longer doc scores lower") {
    val s = score(Seq(1L -> "a b", 2L -> "a b b b b b b b",
      3L -> "c c"), Seq("a"))
    assert(s(1L)._2 > s(2L)._2)
  }
}
