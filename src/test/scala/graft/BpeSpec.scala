package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE tokenizer: textbook merge order on the classic corpus, greedy
  * left-to-right pass semantics (no overlap double-merge), and the
  * plan pin — exchange count independent of the merge-step count. */
class BpeSpec extends SparkSpec {

  test("learns the textbook merge order on the Sennrich-style corpus") {
    import spark.implicits._
    // 5x "low", 2x "lower", 6x "newest", 3x "widest" — the classic
    // worked example: "es" (9) then "est" (9) dominate, then "lo" (7)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "wc")
    val merges = Bpe.learnMerges(vocab, 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    vocab.unpersist(blocking = true)
  }

  test("greedy pass: 'aaa' + merge (a,a) gives [aa, a], not [aa, aa]") {
    import spark.implicits._
    val got = Seq("aaa", "aaaa", "aa")
      .toDF("word")
      .select(col("word"),
        Bpe.tokens(Bpe.encoded(col("word"), Seq(("a", "a")))).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(got == Map(
      "aaa" -> List("aa", "a"),
      "aaaa" -> List("aa", "aa"),
      "aa" -> List("aa")))
  }

  test("tokenCount matches the materialized token array") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"))
    val rows = Seq("newest", "best", "a", "es")
      .toDF("word")
      .select(
        size(Bpe.tokens(Bpe.encoded(col("word"), merges))).cast("long"),
        Bpe.tokenCount(Bpe.encoded(col("word"), merges)).cast("long"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("encode report plans the same exchanges at 1 and 6 merge steps") {
    import spark.implicits._
    val docs = Seq((0L, "low low newest"), (1L, "widest lower newest"))
      .toDF("doc_id", "text")
    def exchanges(steps: Int): Int =
      Bpe.encodeReport(docs, steps)
        .queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    assert(exchanges(1) == exchanges(6))
    spark.catalog.clearCache()
  }
}
