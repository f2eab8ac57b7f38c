package graft

import org.apache.spark.sql.functions._

import graft.app.CurationJob
import graft.curation.Curation

/** End-to-end curation pipeline over the sf0.001 documents table:
  * stage monotonicity, determinism, and output integrity. */
class CurationSpec extends SparkSpec {

  private val docsDir = "/root/testdata/sf0.001/documents.parquet"

  test("CurationJob composes the oracle-checked stages end to end") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-curation").toString
    val m = CurationJob.run(spark, docsDir, out)
    // the funnel only ever narrows, and nothing collapses to zero
    assert(m.docsIn >= m.afterDedup)
    assert(m.afterDedup >= m.afterGate)
    assert(m.afterGate >= m.afterQuality)
    assert(m.afterQuality >= m.afterMixture)
    assert(m.afterMixture >= m.afterBound)
    assert(m.afterBound > 0)
    // the learned gate is a REAL filter on this corpus (q303's
    // step-3 census predicts a strict minority positive)
    assert(m.afterGate < m.afterDedup)
    assert(m.chunksOut >= m.chunksKept && m.chunksKept > 0)
    // chunk output integrity: deduped hashes are globally unique
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.count() == m.chunksKept)
    assert(chunks.select("chunk_hash").distinct().count() == m.chunksKept)
    // per-stage run-metadata round-trips: metrics, classifier census
    // (one row per GD step), per-round mixture weights
    val metrics = spark.read.parquet(s"$out/metrics")
    assert(metrics.count() == 1)
    val census = spark.read.parquet(s"$out/classifier_census")
    assert(census.count() == 3)
    val alpha = spark.read.parquet(s"$out/alpha")
    assert(alpha.count() % 3 == 0 && alpha.count() > 0)
    // contribution bounds hold on the output: only bounded docs reach
    // the chunker, and a 400-char clipped text (<= 400 tokens) yields
    // at most ceil(400/32) = 13 stride-32 chunks per doc
    assert(chunks.select("doc_id").distinct().count() <= m.afterBound)
    val perDoc = chunks.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getAs[Long]("count") <= 13L),
      "a doc exceeds the clipped-text chunk bound")
    // determinism: a second run over the same input is identical
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-curation2").toString
    val m2 = CurationJob.run(spark, docsDir, out2)
    assert(m == m2)
  }

  test("exactDedup keeps the lowest doc_id per content, any partitioning") {
    import spark.implicits._
    val docs = Seq(
      (3L, "same text"), (1L, "same text"), (2L, "other"),
      (9L, "same text"), (4L, "third")).toDF("doc_id", "text")
    def run(n: Int) = Curation.exactDedup(docs.repartition(n))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(run(1) == Seq(1L, 2L, 4L))
    assert(run(1) == run(32))
  }

  test("stratifiedSample is a pure row-local predicate (subset-stable)") {
    // membership of a doc must not depend on which other rows exist
    val docs = spark.read.parquet(docsDir)
    val all = Curation.stratifiedSample(docs,
      Map("src0" -> 500), 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val half = Curation.stratifiedSample(
      docs.filter(col("doc_id") % 2 === 0),
      Map("src0" -> 500), 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(half == all.filter(_ % 2 == 0))
  }

  test("blocklistScrub counts and removes exactly the blocked tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good spark bad spark good"),
      (2L, "clean words only"),
      (3L, "spark")).toDF("doc_id", "text")
    val out = Curation.blocklistScrub(docs, Seq("spark", "bad"))
      .select("doc_id", "n_tokens", "n_blocked", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5L, 3L, "good good"),
      (2L, 3L, 0L, "clean words only"),
      (3L, 1L, 1L, "")))
  }

  test("normalizeText: case, punctuation, whitespace collapse, trim") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "  HELLO world.  "),
      (4L, "hello worlds")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Curation.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // 1/2/3 collapse to one normalized key; 4 stays distinct
    assert(out == Seq((1L, "hello world"), (2L, "hello world"),
      (3L, "hello world"), (4L, "hello worlds")))
  }

  test("canonicalUrl: case, default port, fragment, param order, utm") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://Ex.COM:80/Path?b=2&a=1#frag",
      "http://ex.com/Path?a=1&b=2",
      "https://Ex.com:443?utm_src=x",
      "https://ex.com/",
      "http://ex.com:8080/p?x=1", // non-default port is kept
      "no-scheme/relative?b=1&a=2#f", // relative passes through 2-4
      "http://ex.com/CaseSensitivePath",
      "http://[2001:DB8::1]:80/x", // IPv6 literal: port still strips
      "http://u:p@Ex.com:80/x", // userinfo: port still strips
      "http://u:p@ex.com:8080/x") // userinfo + non-default port kept
    val got = urls.toDF("u")
      .select(Curation.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "http://ex.com/Path?a=1&b=2",
      "http://ex.com/Path?a=1&b=2",
      "https://ex.com/",
      "https://ex.com/",
      "http://ex.com:8080/p?x=1",
      "no-scheme/relative?a=2&b=1",
      "http://ex.com/CaseSensitivePath",
      "http://[2001:db8::1]/x",
      "http://u:p@ex.com/x",
      "http://u:p@ex.com:8080/x"))
  }

  test("cdcChunks: boundaries are content-defined (edit locality)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def word() = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))
    val base = Seq.fill(400)(word()).mkString("")
    val appended = base + Seq.fill(100)(word()).mkString("")
    val prepended = Seq.fill(100)(word()).mkString("") + base
    def chunksOf(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(Curation.cdcChunks(col("text")).as("c"))
        .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val cb = chunksOf(base)
    assert(cb.size > 3, s"degenerate fixture: ${cb.size} chunks")
    // partition property: chunk lengths cover the text exactly
    val lens = Seq(base).toDF("text")
      .select(Curation.cdcChunks(col("text")).as("c"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getInt(1))
    assert(lens.sum == base.length && lens.forall(_ > 0))
    // appending text disturbs nothing before the last boundary
    assert(chunksOf(appended).startsWith(cb.init))
    // prepending text re-aligns after the junction: every base chunk
    // except (at most) the first survives with an identical hash —
    // exactly what fixed-stride chunking cannot do
    val cp = chunksOf(prepended).toSet
    assert(cb.tail.forall(cp.contains))
    // short text: one whole-text chunk
    assert(chunksOf("tiny").size == 1)
  }

  test("redactPii masks emails and phones and counts each redaction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or call 555-123-4567 now"),
      (2L, "two mails x@y.io z@w.co, phone 555 987 6543"),
      (3L, "no pii here, 12345 is not a phone")).toDF("doc_id", "text")
    val out = Curation.redactPii(docs)
      .select("doc_id", "n_emails", "n_phones", "redacted_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 1L, "mail <EMAIL> or call <PHONE> now"),
      (2L, 2L, 1L, "two mails <EMAIL> <EMAIL>, phone <PHONE>"),
      (3L, 0L, 0L, "no pii here, 12345 is not a phone")))
  }

  test("boilerplateSegments marks cross-doc repeats, keeps the rest") {
    import spark.implicits._
    val header = (1 to 10).map(i => s"h$i").mkString(" ") // one segment
    val docs = Seq(
      // header + 13 unique tokens -> segments of len 10, 10, 3
      (1L, s"$header ${(1 to 13).map(i => s"a$i").mkString(" ")}"),
      // header + 5 unique tokens -> segments of len 10, 5
      (2L, s"$header ${(1 to 5).map(i => s"b$i").mkString(" ")}"),
      // the header text TWICE in one doc only: within-doc repetition
      // must NOT mark (the rule is >= 2 DISTINCT documents)
      (3L, ((1 to 10) ++ (1 to 10)).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val rows = Curation.boilerplateSegments(docs, width = 10, minDocs = 2)
      .select("doc_id", "seg_len", "rem").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    // doc 1: header removed, the 13-token remainder (10+3) kept
    assert(rows.filter(_._1 == 1L) == Seq((1L, 3L, 0L), (1L, 10L, 0L),
      (1L, 10L, 1L)))
    // doc 2: header removed, 5-token tail kept
    assert(rows.filter(_._1 == 2L) == Seq((2L, 5L, 0L), (2L, 10L, 1L)))
    // doc 3: identical segment twice within ONE doc — nothing marked
    assert(rows.filter(_._1 == 3L) == Seq((3L, 10L, 0L), (3L, 10L, 0L)))
  }
}
