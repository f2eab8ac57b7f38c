package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — training (merge learning) and
  * application (corpus encode) as distributed jobs (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the word-internal variant: merges never cross word
  * boundaries).
  *
  * Complements q100's first-merge pair count: that query computes the
  * statistic a BPE trainer maximizes ONCE; this module runs the full
  * bounded loop and then encodes, making the engine's token counts
  * (q31/q98/q126 consume whitespace tokens) tokenizer-true.
  *
  * The scale shape: the corpus collapses to the (word, frequency)
  * vocabulary first — the q100 rule; the only corpus-sized operations
  * are that one agg and the final join back to documents. The merge
  * loop runs entirely on the persisted vocabulary: each of the
  * `steps` bounded iterations is one vocab-sized pair-count
  * aggregation whose argmax — a ONE-ROW collect, the bounded
  * driver-reduction rule — becomes a string literal in the next
  * step's projection. Plans never grow a shuffle per iteration: step
  * m is m chained `replace` projections over the same persisted vocab
  * plus the same single aggregation (BpeSpec pins exchange-count
  * independence from `steps`).
  *
  * Oracle portability is the design centerpiece. A BPE merge PASS is
  * greedy left-to-right with the merged output not rescanned within
  * the pass — exactly a LEFT FOLD over the token list carrying a
  * "last token was just merged" marker: on token t, if the previous
  * output token equals x, was not itself produced by a merge of this
  * pass, and t = y, replace it with xy (marked); otherwise append t.
  * (A plain literal string replace on "|x|y|" is NOT this — its match
  * consumes the shared trailing delimiter, so "aaaa" under (a,a)
  * would yield [aa,a,a] instead of the textbook [aa,aa].) Both
  * engines run the identical fold on a delimiter-encoded string
  * accumulator — Spark's `aggregate` higher-order function here,
  * DuckDB's `list_reduce` in the generated oracle — so the pass is a
  * per-row codegen projection, no UDF. Token counts fall out of
  * delimiter arithmetic (`tokenCount`). Words containing the
  * delimiter or marker are excluded identically on both engines. */
object Bpe {

  /** Token delimiter for the string encoding, and the end-of-string
    * marker flagging "last token was produced by the current merge
    * pass". Input words containing either are dropped by [[words]]
    * (and by the oracle's mirrored filter) — acceptable for corpus
    * statistics, and the only way to keep the encoding unambiguous
    * with pure string ops. */
  val Delim = "|"
  val Mark = "*"

  /** (key, word) stream: whitespace split, empty and
    * delimiter/marker-bearing words dropped — the shared tokenizer
    * contract for every census key (doc_id in [[words]], lang in
    * [[fertilityByLang]]). */
  private def wordStream(docs: DataFrame, key: Column,
                         keyName: String): DataFrame =
    docs
      .select(key.as(keyName), explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Delim) &&
        !col("word").contains(Mark))

  /** (doc_id, word) pairs: whitespace split, empty and
    * delimiter/marker-bearing words dropped. */
  def words(docs: DataFrame): DataFrame =
    wordStream(docs, col("doc_id"), "doc_id")

  /** Initial character-level encoding: "key" → "|k|e|y|". */
  def enc0(word: Column): Column =
    concat(lit(Delim), regexp_replace(word, "(.)", "$1" + Delim))

  /** One greedy left-to-right merge pass of (x, y) → xy: the marked
    * fold from the object doc. The accumulator is the delimited
    * output string, suffixed with [[Mark]] when its last token was
    * produced by THIS pass (blocking it from acting as the x of a
    * following merge — it cannot end with "|x|" while marked, so the
    * first branch is never taken on it); the next append strips the
    * mark. Runs as a codegen'd per-row expression. */
  def applyMerge(enc: Column, x: String, y: String): Column = {
    val folded = aggregate(tokens(enc), lit(Delim), (acc, t) =>
      when(acc.endsWith(lit(Delim + x + Delim)) && t === y,
        concat(acc.substr(lit(1), length(acc) - lit(x.length + 1)),
          lit(x + y + Delim + Mark)))
        .when(acc.endsWith(lit(Mark)),
          concat(acc.substr(lit(1), length(acc) - 1), t, lit(Delim)))
        .otherwise(concat(acc, t, lit(Delim))))
    when(folded.endsWith(lit(Mark)),
      folded.substr(lit(1), length(folded) - 1)).otherwise(folded)
  }

  /** Full encode of `word` under an ordered merge list. */
  def encoded(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(enc0(word)) { case (e, (x, y)) => applyMerge(e, x, y) }

  /** Tokens of a delimiter-encoded string (non-empty splits). */
  def tokens(enc: Column): Column =
    filter(split(enc, "\\" + Delim), t => t =!= "")

  /** Token count without materializing the array: #delims − 1. */
  def tokenCount(enc: Column): Column =
    (length(enc) - length(replace(enc, lit(Delim), lit("")))) - 1

  /** Learn `steps` merges from a (word, wc) vocabulary and return the
    * encoded vocabulary (word, wc, enc) plus the ordered merge list.
    * Ties broken deterministically: max count, then (x, y)
    * lexicographic — the oracle replays the identical rule. Stops
    * early if no adjacent pair remains.
    *
    * The frame is `localCheckpoint`ed after every pass (the
    * Components/PageRank iteration rule), so each step's plan is
    * exactly ONE fold projection over the materialized previous step
    * — expression depth is constant in `steps`. Without the
    * truncation, step m carries m NESTED aggregate-HOF folds and
    * Janino has to compile a generated method that grows with m:
    * measured at steps=8, codegen blew past task limits and the job
    * crawled; with it, every step compiles the same small class. */
  def learnAndEncode(vocab: DataFrame,
                     steps: Int): (DataFrame, Seq[(String, String)]) = {
    var cur = Checkpoints.pin(vocab.select(col("word"), col("wc"),
      enc0(col("word")).as("enc")).localCheckpoint())
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (acc.size < steps && !exhausted) {
      val top = cur
        .select(col("wc"), tokens(col("enc")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("wc"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(element_at(col("toks"), col("i")).as("x"),
          element_at(col("toks"), col("i") + 1).as("y"), col("wc"))
        .groupBy(col("x"), col("y")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()
      top.headOption match {
        case Some(r) =>
          val (x, y) = (r.getString(0), r.getString(1))
          acc += ((x, y))
          val next = Checkpoints.pin(cur.select(col("word"), col("wc"),
            applyMerge(col("enc"), x, y).as("enc")).localCheckpoint())
          Checkpoints.free(cur) // superseded pass: RDD-level free
          cur = next
        case None => exhausted = true
      }
    }
    (cur, acc.toSeq)
  }

  /** Merge list only (spec convenience). */
  def learnMerges(vocab: DataFrame, steps: Int): Seq[(String, String)] =
    learnAndEncode(vocab, steps)._2

  /** End-to-end: learn `steps` merges, encode, and report the top 20
    * documents by tokenizer-true token count with the compression
    * ratio (chars per token) in integer ppm. */
  def encodeReport(docs: DataFrame, steps: Int): DataFrame = {
    val w = words(docs)
    val vocab = w.groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val (encVocabFull, _) = learnAndEncode(vocab, steps)
    val encVocab = encVocabFull.select(col("word"),
      tokenCount(col("enc")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_char"))
    w.join(encVocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_tok")).as("n_tokens"),
        sum(col("n_char")).as("n_chars"))
      .select(col("doc_id"), col("n_tokens"),
        expr("n_chars * 1000000 div n_tokens").as("compression_ppm"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-language tokenizer fertility under the SAME learned merges
    * as [[encodeReport]] (identical vocabulary — the word multiset is
    * key-independent): subword tokens per word and chars per token,
    * in exact ppm, one row per `lang`. The multilingual-budget signal
    * (q150): high fertility = more sequence length per unit text. */
  def fertilityByLang(docs: DataFrame, steps: Int): DataFrame = {
    val w = wordStream(docs, col("lang"), "lang")
    val vocab = w.groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val (encVocabFull, _) = learnAndEncode(vocab, steps)
    val encVocab = encVocabFull.select(col("word"),
      tokenCount(col("enc")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_char"))
    w.join(encVocab, Seq("word"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"),
        sum(col("n_char")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000000 div n_words").as("fertility_ppm"),
        expr("n_chars * 1000000 div n_tokens").as("chars_per_token_ppm"))
      .orderBy("lang")
  }
}
