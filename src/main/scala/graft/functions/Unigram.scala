package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi word
  * segmentation with a FIXED integer milli-nat piece inventory — the
  * tokenizer family's second member next to BPE ([[Bpe]], q129/q150):
  * where BPE greedily applies learned merges, the unigram model picks
  * the GLOBALLY cheapest segmentation of each word by dynamic
  * programming over piece costs.
  *
  * DP: best(0) = 0; best(j) = min over piece lengths p ≤ 4 with
  * word[j−p+1..j] in the inventory of best(j−p) + cost(piece). Every
  * cost is an integer milli-nat, and each step's contribution is
  * PACKED as `cost·64 + 1`, so the running total is
  * `Σcosts·64 + n_pieces` and a single integer MIN is lexicographic
  * (cheapest cost, then fewest pieces) — fully deterministic, no
  * float anywhere (the q108 packed-fold discipline). Single letters
  * all carry a cost, so every [a-z]+ word is segmentable; absent
  * longer pieces surface as a +10⁹ sentinel that can never win.
  *
  * Execution is the q108 recurrence pattern: one codegen'd
  * `aggregate` fold per DISTINCT word (positions 1..len, array-of-
  * costs state), so corpus size only enters through the vocabulary
  * census — at 100 TB the DP runs once per distinct word, not once
  * per token, and the piece inventory is a literal in the generated
  * code (no join, no broadcast). The oracle replays the identical DP
  * as generated per-position CTEs.
  */
object Unigram {

  /** Max piece length the DP looks back (and the CTE generator
    * mirrors). */
  val MaxPiece = 4

  /** Max word length the DP (and the oracle's generated CTEs)
    * covers; longer words are filtered out of the census. */
  val MaxWord = 24

  /** Fixed piece inventory (piece → integer milli-nat cost). Singles
    * cover [a-z] at 3000 so every word is reachable; multi-char
    * pieces price below the sum of their letters (bigram ≈ 3500–4600
    * < 6000, trigram < 9000, 4-gram < 12000) so the DP prefers them
    * where they appear — the unigram-LM shape: frequent pieces are
    * cheap. */
  val pieces: Seq[(String, Int)] =
    ('a' to 'z').map(c => c.toString -> 3000) ++ Seq(
      "th" -> 3500, "he" -> 3600, "in" -> 3600, "er" -> 3700,
      "an" -> 3700, "re" -> 3800, "on" -> 3800, "at" -> 3900,
      "en" -> 3900, "nd" -> 4000, "ti" -> 4000, "es" -> 4000,
      "or" -> 4100, "te" -> 4100, "of" -> 4100, "ed" -> 4200,
      "is" -> 4200, "it" -> 4200, "al" -> 4300, "ar" -> 4300,
      "st" -> 4300, "to" -> 4400, "nt" -> 4400, "ng" -> 4400,
      "se" -> 4500, "ha" -> 4500, "as" -> 4500, "ou" -> 4600,
      "io" -> 4600, "le" -> 4600,
      "the" -> 5000, "ing" -> 5200, "and" -> 5300, "ion" -> 5500,
      "ent" -> 5600, "for" -> 5700, "tio" -> 5800, "ere" -> 5900,
      "her" -> 5900, "ate" -> 6000, "ver" -> 6000, "ter" -> 6100,
      "tha" -> 6100, "ati" -> 6200, "hat" -> 6200,
      "tion" -> 7000, "atio" -> 7200, "that" -> 7300, "ther" -> 7400,
      "with" -> 7500, "ment" -> 7600, "ions" -> 7700, "this" -> 7800)

  /** Sentinel for an absent piece: big enough to never win, small
    * enough that 24 packed steps stay far inside a long. */
  private val Absent = 1000000000L

  private def mapLiteralSql: String =
    "map(" + pieces.map { case (p, c) => s"'$p', ${c}L" }.mkString(", ") + ")"

  /** The packed Viterbi fold over one word column as a SQL expression
    * (codegen'd `aggregate`, the q108 pattern). Returns
    * `Σcosts·64 + n_pieces` for the cheapest segmentation. */
  def dpExpr(wordCol: String): Column = {
    val m = mapLiteralSql
    // try_element_at: ANSI-safe null (not an error) for absent pieces
    def cost(p: Int) =
      s"(coalesce(try_element_at($m, substr($wordCol, j - ${p - 1}, $p)), ${Absent}L) * 64 + 1)"
    val branches = (1 to MaxPiece).map { p =>
      val t = s"element_at(acc, j - ${p - 1}) + ${cost(p)}"
      if (p == 1) t else s"if(j >= $p, $t, ${Long.MaxValue / 4}L)"
    }.mkString(",\n        ")
    expr(
      s"""aggregate(
        |  sequence(1, length($wordCol)),
        |  array(0L),
        |  (acc, j) -> array_append(acc,
        |      least($branches)),
        |  a -> element_at(a, -1))""".stripMargin)
  }

  /** (word, packed) for every distinct word in `words(wordCol)` —
    * the DP runs once per vocabulary entry. */
  def segmentCosts(words: DataFrame, wordCol: String): DataFrame =
    words.select(col(wordCol).as("word")).distinct()
      .withColumn("packed", dpExpr("word"))

  // ---------------------------------------------------- oracle SQL

  /** VALUES-list CTE body for the piece inventory. */
  def piecesValuesSql: String =
    pieces.map { case (p, c) => s"('$p', $c)" }.mkString(", ")

  /** The generated per-position DP CTEs (`b0`..`b$MaxWord`, each
    * MATERIALIZED — DuckDB inlines plain CTEs, and b_j is referenced
    * by up to 4 later steps, so inlining would explode the plan and
    * the parquet open count exponentially) plus a
    * `fin(word, packed)` CTE — the oracle replay of [[dpExpr]] over a
    * `vocab(word)` CTE and a `pieces(piece, cost)` CTE that the
    * caller must have defined. */
  def dpCtesSql: String = {
    val steps = (1 to MaxWord).map { j =>
      val branches = (1 to math.min(MaxPiece, j)).map { p =>
        s"""SELECT w.word, b${j - p}.best + pc.cost*64 + 1 AS v
           |      FROM vocab w
           |      JOIN b${j - p} ON b${j - p}.word = w.word
           |      JOIN pieces pc ON pc.piece = substr(w.word, ${j - p + 1}, $p)
           |      WHERE length(w.word) >= $j""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      s"""b$j AS MATERIALIZED (
         |  SELECT word, MIN(v) AS best FROM (
         |      $branches) GROUP BY word)""".stripMargin
    }
    val fin = (1 to MaxWord).map(j =>
      s"SELECT word, best AS packed FROM b$j WHERE length(word) = $j")
      .mkString("\n    UNION ALL\n    ")
    s"""b0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS best FROM vocab),
       |${steps.mkString(",\n")},
       |fin AS (
       |    $fin)""".stripMargin
  }
}
