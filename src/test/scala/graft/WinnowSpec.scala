package graft

import org.apache.spark.sql.functions._

import graft.curation.Curation

/** Winnowing fingerprint guarantees (Schleimer–Wilkerson–Aiken): window
  * coverage, density bounds, rightmost-tie rule, and the shared-substring
  * detection floor that makes the scheme usable for plagiarism/overlap
  * detection at a bounded index size. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  private val K = 5
  private val W = 4

  private def fp(docs: Seq[(Long, String)]) =
    Curation.winnowFingerprints(
      docs.toDF("doc_id", "text").withColumn("source", lit("t")),
      k = K, w = W)

  test("every window of w grams contains a selected fingerprint") {
    // deterministic word-soup docs of varying length
    val words = Seq("a", "b", "c", "d", "e", "f", "g")
    val docs = (0L until 8L).map { id =>
      val n = 8 + (id * 7 % 23).toInt
      id -> (0 until n)
        .map(j => words(((j * 31 + id * 17 + j * j) % 7).toInt))
        .mkString(" ")
    }
    val sel = fp(docs).select("doc_id", "fi").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val g = text.split(" ").length - (K - 1) // gram count
      val fis = sel.getOrElse(id, Set.empty)
      // coverage: each full window [i-w+1, i] holds >= 1 fingerprint
      (W to g).foreach { i =>
        assert((i - W + 1 to i).exists(p => fis.contains(p.toLong)),
          s"doc $id window ending at $i uncovered (selected: $fis)")
      }
      // density bounds: at most one per window position, and coverage
      // forces at least ceil(windows/w) selections
      val windows = g - W + 1
      assert(fis.size <= windows)
      assert(fis.size >= (windows + W - 1) / W)
    }
  }

  test("ties select the rightmost position (the SWA robustness rule)") {
    // 10 identical tokens -> 6 identical gram hashes; every window's
    // min ties across all 4 members, so each window selects its own
    // rightmost gram: positions 4, 5, 6.
    val sel = fp(Seq(1L -> Seq.fill(10)("x").mkString(" ")))
      .select("fi").as[Long].collect().toSet
    assert(sel == Set(4L, 5L, 6L))
  }

  test("a shared substring of >= w+k-1 tokens shares a fingerprint") {
    val shared = "p q r s t u v w" // 8 tokens = w+k-1
    val a = s"a1 a2 a3 $shared a4 a5"
    val b = s"b1 $shared b2 b3 b4 b5 b6"
    val byDoc = fp(Seq(1L -> a, 2L -> b))
      .select("doc_id", "fh").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "guaranteed shared fingerprint missing")
  }

  test("docs shorter than k produce no grams and no fingerprints") {
    assert(fp(Seq(1L -> "only four words here")).count() == 0L)
  }
}
