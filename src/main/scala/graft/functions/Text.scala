package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, MinHash, SimHash, rolling-hash
  * fingerprints, language ID, quality stats.
  *
  * Everything is a pure `Column` expression (codegen'd, no UDFs), so
  * the operators scale linearly: per-document work only, no driver
  * collection, and the only shuffles are the explicit groupBys in the
  * queries that use them.
  *
  * Cross-engine determinism notes (these feed DuckDB-oracle-checked
  * queries):
  *  - Hashes are md5 hex strings (identical in every engine). MinHash
  *    uses the *string minimum* of salted md5s — lexicographic min of
  *    fixed-length lower-hex equals numeric min, so no hex→int
  *    conversion is ever needed.
  *  - SimHash derives 16 bits from the first 4 hex chars; hex→int is
  *    done with `locate` arithmetic, identical everywhere.
  */
object Text {
  /** Whitespace tokenizer (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles; documents with <3 tokens yield no shingles.
    *
    * IMPORTANT: pass a *materialized array attribute* (project
    * `tokens(text)` in its own select first), not `tokens(col)` inline.
    * Higher-order-function lambdas re-evaluate their body per element,
    * so an inlined `split` would re-tokenize the whole document for
    * every shingle — O(tokens²) per row. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1),
          element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Salted hash for MinHash permutation `j` — min over shingles of this
    * string is the j-th signature component. */
  def saltedHash(j: Int, shingle: Column): Column =
    md5(concat(lit(s"$j:"), shingle))

  /** Integer value of the first 4 hex chars of an md5 (0..65535). */
  def hex4(md5hex: Column): Column =
    conv(substring(md5hex, 1, 4), 16, 10).cast("int")

  /** ±1 contribution of bit `p` (0..15) of a token's hex4 value. */
  def bitSign(v: Column, p: Int): Column =
    when(shiftright(v, p).bitwiseAND(lit(1)) === 1, lit(1)).otherwise(lit(-1))

  /** Rolling character 8-gram hashes (1-based substring, matches
    * DuckDB `substr`). Documents shorter than 8 chars yield none. */
  def charGrams8(text: Column): Column =
    when(length(text) >= 8,
      transform(sequence(lit(1), length(text) - 7), i =>
        md5(substr(text, i, lit(8)))))
      .otherwise(array().cast("array<string>"))

  /** Language marker lists for the heuristic language ID. Priority order
    * (en, es, de, fr, zh) breaks score ties deterministically. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Marker-hit count for one language over a token array. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Deterministic argmax over MATERIALIZED score columns: first
    * language (in declaration order) whose score equals the maximum;
    * 'und' when all scores are zero. Pure scalar int comparisons —
    * callers must project the `langScore`s into attributes first
    * (one HOF eval each per row); composing this over raw
    * `langScore(tokens(text))` expressions would re-evaluate every
    * filter+split per occurrence, interpreted (the measured q30
    * pathology). */
  def langPick(scores: Seq[(String, Column)]): Column = {
    val mx = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === mx, l).otherwise(acc)
    }
    when(mx > 0, pick).otherwise(lit("und"))
  }

  /** Single-expression language ID (argmax of [[langScore]]s). Only for
    * small frames / tests: see the [[langPick]] note — in a query,
    * stage the scores as columns instead. */
  def langId(toks: Column): Column =
    langPick(langMarkers.map { case (l, m) => l -> langScore(toks, m) })
}
