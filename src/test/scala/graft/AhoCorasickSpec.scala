package graft

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick

class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  /** Naive overlap-inclusive truth: count every position where the
    * pattern occurs. */
  private def naiveCount(text: String, pat: String): Int =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length))

  test("counts every overlap-inclusive occurrence (vs naive scan)") {
    val pats = Seq("aa", "ab", "aba", "customer", "me")
    val ac = AhoCorasick.build(pats)
    for (text <- Seq("aaaa", "ababab", "the customer came home", "", "x",
        "abacustomerabaab")) {
      val got = ac.countMatches(text).toSeq
      val want = pats.map(naiveCount(text, _))
      assert(got == want, s"text='$text': got $got want $want")
    }
  }

  test("fail-chain outputs: suffix pattern found inside longer match") {
    val ac = AhoCorasick.build(Seq("spark", "park", "ark"))
    assert(ac.countMatches("spark").toSeq == Seq(1, 1, 1))
    assert(ac.countMatches("park park spark").toSeq == Seq(1, 3, 3))
  }

  test("randomized cross-check against the naive scanner") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val pats = Seq("a", "ab", "ba", "abc", "cab", "bb", "aab")
    val ac = AhoCorasick.build(pats)
    for (_ <- 1 to 200) {
      val text = Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(ac.countMatches(text).toSeq == pats.map(naiveCount(text, _)),
        s"text='$text'")
    }
  }

  test("rejects empty patterns") {
    intercept[IllegalArgumentException] { AhoCorasick.build(Seq("a", "")) }
    intercept[IllegalArgumentException] { AhoCorasick.build(Nil) }
  }

  test("measured: one-pass automaton vs per-pattern scan at sf0.1 (50 patterns)") {
    // The scale claim behind q173: the automaton's cost is independent
    // of |patterns|, the per-pattern replace-scan's is linear in it.
    // Both compute identical overlap-free totals here (patterns are
    // chosen non-self-overlapping so replace-counting agrees).
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text")).localCheckpoint()
    docs.count() // materialize: time transforms, not the scan
    val words = Seq("customer", "spark", "table", "value", "query",
      "data", "batch", "window", "order", "line")
    val pats = words.take(5) ++
      (for (a <- words; b <- words.take(5) if a != b) yield s"$a $b")
    assert(pats.size == 50 && pats.forall(p => !selfOverlaps(p)))
    val ac = AhoCorasick.build(pats)
    val bc = spark.sparkContext.broadcast(ac)
    val acUdf = udf((t: String) => bc.value.countMatches(t).sum)
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (acTotal, acSec) = time {
      docs.agg(sum(acUdf(col("text")))).head().getLong(0)
    }
    // per-pattern form: one replace-scan per pattern, summed
    val perPatExpr = pats.map(p =>
      (length(col("text")) - length(replace(col("text"), lit(p), lit("")))) /
        p.length).reduce(_ + _)
    val (scanTotal, scanSec) = time {
      docs.agg(sum(perPatExpr.cast("long"))).head().getLong(0)
    }
    info(f"sf0.1, 50 patterns: automaton $acSec%.2fs, per-pattern scan $scanSec%.2fs, totals $acTotal/$scanTotal")
    System.err.println(
      f"[aho] sf0.1 50-pattern comparison: automaton $acSec%.2fs vs per-pattern $scanSec%.2fs (totals $acTotal/$scanTotal)")
    assert(acTotal == scanTotal,
      s"semantics diverged: $acTotal vs $scanTotal")
    // honest soft bound: the automaton must at least be in the same
    // class; on this host it is typically several times faster
    assert(acSec < scanSec * 2.0,
      f"automaton $acSec%.2fs should not be slower than 2x the scan $scanSec%.2fs")
    docs.unpersist()
  }

  private def selfOverlaps(p: String): Boolean =
    (1 until p.length).exists(k => p.regionMatches(0, p, k, p.length - k))
}
