package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Par.FanoutOps

import graft.Tables
import graft.functions.{LangModel, Text}

/** Training-data curation operators over the `documents` table:
  * exact + near-duplicate detection (MinHash/LSH, SimHash, n-gram
  * Jaccard, rolling-hash fingerprints), text statistics, language ID,
  * token counting. Reference capability anchor: the silver-layer
  * cleaning/dedup surface (SURVEY §2.5) extended to corpus scale per
  * BASELINE extension goals (SURVEY §2.9, §7.8).
  *
  * Scale design: every pipeline is explode → groupBy(doc) →
  * band-join. Work per document is O(tokens); the only joins are LSH
  * band buckets (bounded fan-out by construction) — never an all-pairs
  * product except in the explicitly-bounded brute-force baselines.
  */
object TextQueries {
  private val B = 4  // LSH bands
  private val R = 4  // rows (hashes) per band; K = B*R MinHash perms
  private val K = B * R

  import org.apache.spark.sql.{Column, DataFrame, SparkSession}

  /** Tokenized shingle lists per document (tokens materialized in
    * their own projection — see [[Text.shingles3]] perf note).
    *
    * The ≥3-token filter runs on `size(t)` BEFORE the shingle
    * projection, never on `size(sh)` after it: a post-shingle
    * `filter(size(sh) > 0)` gets pushed below the projections and
    * Catalyst substitutes the whole shingles3 expression into the
    * predicate with `split(text)` re-inlined INSIDE the transform
    * lambda — re-tokenizing the document once per shingle element,
    * O(tokens²) interpreted per row (measured 10-30× the cost of the
    * entire rest of the pipeline; this, not hashing, was the round-1
    * q23/q24 bench bottleneck). The size(t) form pushes down as one
    * linear `size(split(text, ' ')) >= 3` per row and is equivalent:
    * sh is non-empty iff the document has ≥3 tokens. */
  private def shingleTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // one small parquet file reads as ONE input partition; without
      // this repartition every per-document expression below runs in
      // a single task (at production scale the many input splits make
      // it unnecessary, but it must not be the code's assumption)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Text.shingles3(col("t")).as("sh"))

  /** Distinct shingle set per document — the verify-stage side input
    * shared by q24, [[nearDupPairs]] (q50/q66/q79/q110), q107 and
    * q109; one copy so the set construction can never desynchronize
    * between the pairwise and incremental dedup paths. */
  private def shingleSets(shl: DataFrame): DataFrame =
    shl.select(col("doc_id"), array_distinct(col("sh")).as("st"))

  /** The shingle frame persisted for multi-consumer queries: every
    * dedup query reads it at least twice (signatures + verify sets),
    * and recomputing means tokenizing the corpus once per consumer
    * (the q104/Ranks multi-consumer rule). Retention is bounded by the
    * harness clearCache-between-queries contract. */
  private def persistedShingles(s: SparkSession, d: String): DataFrame =
    shingleTable(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Shingle-set Jaccard of two array columns (|a∩b| / |a∪b|). */
  private def jaccard(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb))
    inter.cast("double") / (size(sa) + size(sb) - inter)
  }

  /** Near-duplicate Jaccard threshold (q50's drop rule; also the
    * oracle literal in every dedup query's SQL). */
  private val JAC_T = 0.8

  /** Wide MinHash signature table (doc_id, mh0..mh15) as a pure
    * per-row projection — no explode, no shuffle, no aggregation. This
    * is the embarrassingly-parallel formulation (each document's
    * signature depends only on its own shingles), which is exactly what
    * you want fanned across a 1000-executor cluster.
    *
    * Hash family: ONE md5 per shingle + K universal-hash permutations
    * `(a + j·b) mod 2^32` (a = digest bytes 0–3, b = bytes 4–7 forced
    * odd) — 16× less hashing than salted-md5-per-permutation, which
    * keeps the kernel fast even if the JVM degrades to interpreted
    * execution (the round-1 driver bench pathology, NOTES_r1 #3). */
  private def minhashWide(shingles: DataFrame): DataFrame =
    shingles
      .select(col("doc_id"),
        org.apache.spark.sql.graft.GraftText.minhashU32(col("sh"), K)
          .as("mh"))
      .select(col("doc_id") +:
        (0 until K).map(j => element_at(col("mh"), j + 1).as(s"mh$j")): _*)

  /** DuckDB rendering of one unsigned-32 value from 8 hex chars of an
    * md5 starting at 1-based position `start` (column `hx`) — the
    * oracle-side mirror of [[graft.curation.Curation.contentU32]]
    * (big-endian, same value). Shared across query registries. */
  private[queries] def hexU32Sql(start: Int): String =
    (0 until 8).map { i =>
      s"CAST(strpos('0123456789abcdef', substr(hx, ${start + i}, 1)) - 1" +
        s" AS BIGINT) * ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")

  /** Shared oracle CTE: per-shingle (a, hb) universal-hash parameters,
    * mirroring [[org.apache.spark.sql.graft.TextKernels.minhashU32]].
    * Permutation j of a shingle is `(a + j*hb) % 4294967296`. */
  private val abCte =
    s"""ex AS (SELECT doc_id, unnest(sh) AS s FROM shl),
      |ab AS (
      |  SELECT doc_id, ${hexU32Sql(1)} AS a, (${hexU32Sql(9)} | 1) AS hb
      |  FROM (SELECT doc_id, md5(s) AS hx FROM ex))""".stripMargin

  /** Shared oracle CTEs: tokens and shingle lists per document. */
  private val tokCte =
    """WITH tok AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t
      |  FROM documents),
      |shl AS (
      |  SELECT doc_id, list_transform(range(len(t)-2),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS sh
      |  FROM tok WHERE len(t) >= 3)""".stripMargin

  /** q22 — exact dedup by content hash, keep-first semantics
    * (SURVEY §2.5 D1). Per-source dup accounting in one hash-groupBy
    * pass; at 100 TB this is the cheapest dedup (one shuffle on the
    * 128-bit content hash). */
  val q22 = QueryDef(
    "q22_exact_dedup",
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_distinct,
      |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
      .orderBy("source")
  }

  /** q23 — MinHash signatures (K=16 permutations) as the minimum of
    * `(a + j·b) mod 2^32` universal hashes over each document's
    * shingles (one md5 per shingle). Pure per-row projection — no
    * explode, no aggregation shuffle; the unsigned-32 values are
    * engine-independent integers. */
  val q23 = QueryDef(
    "q23_minhash_signature",
    tokCte + ",\n" + abCte +
      """,
      |sig AS (
      |  SELECT doc_id, j, min((a + j * hb) % 4294967296) AS minhash
      |  FROM ab CROSS JOIN range(16) AS r(j)
      |  GROUP BY doc_id, j)
      |SELECT doc_id, j, minhash FROM sig
      |ORDER BY doc_id, j""".stripMargin) { (s, d) =>
    val stackArgs = (0 until K)
      .map(j => s"${j}L, mh$j").mkString(", ")
    minhashWide(shingleTable(s, d))
      .selectExpr("doc_id", s"stack($K, $stackArgs) AS (j, minhash)")
      .orderBy("doc_id", "j")
  }

  /** q24 — MinHash+LSH near-duplicate pairs: band signatures (B=4,
    * R=4) → bucket self-join → exact shingle-Jaccard verify ≥ 0.8.
    * The band join bounds candidate fan-out (the LSH contract); the
    * quadratic all-pairs product never materializes. Candidate pairs
    * then join back to distinct-shingle sets for exact verification —
    * integer set sizes, so the Jaccard division is bit-identical. */
  /** Shared oracle CTE block: LSH band candidates + distinct shingle
    * sets (`cand(da, db)`, `sets(doc_id, st)`) — the q24 pipeline up
    * to the verify stage, reused verbatim by q176's threshold sweep. */
  private def lshCandSql: String = {
    val sigCols = (0 until K)
      .map(j => s"min((a + $j * hb) % 4294967296) AS mh$j").mkString(", ")
    val bandCase = (0 until B).map { b =>
      val cat = (0 until R).map(r => s"CAST(mh${R * b + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"WHEN $b THEN $cat"
    }.mkString(" ")
    tokCte + ",\n" + abCte +
      s""",
      |sig AS (SELECT doc_id, $sigCols FROM ab GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, b, CASE b $bandCase END AS bsig
      |  FROM sig CROSS JOIN range($B) AS r(b)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM shl)""".stripMargin
  }

  val q24 = QueryDef(
    "q24_lsh_near_dup",
    lshCandSql +
      s""",
        |jac AS (
        |  SELECT c.da, c.db,
        |    len(list_intersect(sa.st, sb.st)) * 1.0 /
        |      (len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st)))
        |      AS j
        |  FROM cand c
        |  JOIN sets sa ON sa.doc_id = c.da
        |  JOIN sets sb ON sb.doc_id = c.db)
        |SELECT da AS doc_a, db AS doc_b,
        |  CAST(FLOOR(j * 10000 + 0.5) AS BIGINT) / 10000.0 AS jaccard
        |FROM jac WHERE j >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // ONE persisted shingle pass feeds signatures AND verify sets
    // (the q104/Ranks multi-consumer rule; retention bounded by the
    // harness clearCache contract). Broadcast discipline (r2 verdict
    // What's-wrong #3): `bands` is 4 rows per DOCUMENT —
    // dataset-sized, never broadcast; its self-join shuffles on the
    // band key (AQE still picks a broadcast when the run-time size is
    // genuinely small). Only `cand` — bounded by the LSH band
    // contract — carries a hint (inside pairSets). q24 keeps the
    // plain-join candidate path as the independent cross-check of the
    // native LshJoin operator nearDupPairs uses.
    val shl = persistedShingles(s, d)
    val cand = selfBandPairs(bandTable(shl))
    pairSets(cand, shingleSets(shl))
      .select(col("da"), col("db"),
        jaccard(col("sta"), col("stb")).as("j"))
      .filter(col("j") >= JAC_T)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        graft.functions.Exact.roundP(col("j"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** q25 — brute-force n-gram Jaccard baseline on an explicitly bounded
    * slice (doc_id < 100): the exactness yardstick the LSH path is
    * measured against. Top-10 with a full deterministic order. */
  val q25 = QueryDef(
    "q25_ngram_jaccard",
    tokCte +
      """,
      |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM shl
      |         WHERE doc_id < 100)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(FLOOR(len(list_intersect(a.st, b.st)) * 1.0 /
      |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)))
      |    * 10000 + 0.5) AS BIGINT) / 10000.0 AS jaccard
      |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      |ORDER BY jaccard DESC, doc_a, doc_b
      |LIMIT 10""".stripMargin) { (s, d) =>
    // ≥3-token filter BEFORE the shingle projection (same O(tokens²)
    // pushdown trap as shingleTable — see its doc).
    val sets = Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        array_distinct(Text.shingles3(col("t"))).as("st"))
    val inter = size(array_intersect(col("a.st"), col("b.st")))
    sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        graft.functions.Exact.roundP(inter.cast("double") /
          (size(col("a.st")) + size(col("b.st")) - inter), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(10)
  }

  /** q26 — 16-bit SimHash over the token multiset (hex4 of each
    * token's md5; per-bit ±1 majority vote). Multiset (not set) because
    * this corpus has a 31-word vocabulary — multiplicities carry the
    * signal. One explode + one groupBy. */
  val q26 = QueryDef(
    "q26_simhash", {
      val vExpr = (0 until 4).map(i =>
        s"(strpos('0123456789abcdef', substr(md5(tkn), ${i + 1}, 1)) - 1) " +
          s"* ${1 << (4 * (3 - i))}").mkString(" + ")
      val sums = (0 until 16).map(p =>
        s"SUM(CASE WHEN (v >> $p) & 1 = 1 THEN 1 ELSE -1 END) AS s$p")
        .mkString(", ")
      val bits = (0 until 16).map(p =>
        s"(CASE WHEN s$p > 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tkn
        |  FROM documents),
        |v AS (SELECT doc_id, $vExpr AS v FROM tok),
        |b AS (SELECT doc_id, $sums FROM v GROUP BY doc_id)
        |SELECT doc_id, CAST($bits AS INT) AS simhash
        |FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.GraftText.simhash16(col("t"))
          .as("simhash"))
      .orderBy("doc_id")
  }

  /** q27 — SimHash near-dup census: Hamming-distance histogram over all
    * pairs (bounded 17-row output). The planted near-dups surface at
    * distance 0. At scale the same signatures band by prefix exactly
    * like q24 — the histogram here doubles as the recall-tuning
    * diagnostic for choosing that band width. */
  val q27 = QueryDef(
    "q27_simhash_pairs", {
      val vExpr = (0 until 4).map(i =>
        s"(strpos('0123456789abcdef', substr(md5(tkn), ${i + 1}, 1)) - 1) " +
          s"* ${1 << (4 * (3 - i))}").mkString(" + ")
      val sums = (0 until 16).map(p =>
        s"SUM(CASE WHEN (v >> $p) & 1 = 1 THEN 1 ELSE -1 END) AS s$p")
        .mkString(", ")
      val bits = (0 until 16).map(p =>
        s"(CASE WHEN s$p > 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tkn
        |  FROM documents),
        |v AS (SELECT doc_id, $vExpr AS v FROM tok),
        |b AS (SELECT doc_id, $sums FROM v GROUP BY doc_id),
        |sh AS (SELECT doc_id, $bits AS sim FROM b)
        |SELECT CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming,
        |  COUNT(*) AS n_pairs
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    // Compact-pair formulation: aggregate documents to distinct
    // (simhash, count) first — bounded at 65,536 rows by the 16-bit
    // signature space — then compute the full pair histogram in ONE
    // kernel call over the collected (sim, cnt) list (hamming(u,v)
    // weighted cu*cv off-diagonal, C(cu,2) on the diagonal). Identical
    // histogram to the all-docs pair join the oracle runs, with no
    // non-equi θ-join (the round-1 plan was a 12.5M-pair
    // BroadcastNestedLoopJoin); the O(D²) loop is a bounded constant
    // at any corpus size.
    val sh = Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(org.apache.spark.sql.graft.GraftText.simhash16(col("t"))
        .as("sim"))
      .groupBy(col("sim")).agg(count(lit(1)).as("cnt"))
    sh.agg(collect_list(struct(col("sim"), col("cnt"))).as("sc"))
      .select(posexplode(
        org.apache.spark.sql.graft.GraftText.hammingCensus16(col("sc"))))
      .toDF("hamming", "n_pairs")
      .filter(col("n_pairs") > 0)
      .orderBy("hamming")
  }

  /** q28 — rolling-hash document fingerprint: min md5 over character
    * 8-grams (winnowing-style content signature, robust to token
    * reordering at the edges), plus distinct-gram count. Pure per-row
    * expression — no shuffle at all. */
  val q28 = QueryDef(
    "q28_rolling_fingerprint",
    """SELECT doc_id,
      |  list_aggregate(list_transform(range(length(text) - 7),
      |    i -> md5(substr(text, i + 1, 8))), 'min') AS fingerprint,
      |  len(list_distinct(list_transform(range(length(text) - 7),
      |    i -> md5(substr(text, i + 1, 8))))) AS n_distinct_grams
      |FROM documents
      |WHERE length(text) >= 8
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.GraftText.gram8Fingerprint(col("text"))
          .as("fp"))
      .select(col("doc_id"), col("fp.fingerprint").as("fingerprint"),
        col("fp.n_distinct_grams").as("n_distinct_grams"))
      .orderBy("doc_id")
  }

  /** q29 — per-source text-quality statistics: token totals,
    * type/token ratio, mean document length. Integer sums (exact), one
    * divide at the end. */
  val q29 = QueryDef(
    "q29_text_stats",
    """WITH t AS (
      |  SELECT source, length(text) AS n_chars,
      |    len(string_split(text, ' ')) AS nt,
      |    len(list_distinct(string_split(text, ' '))) AS nu
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
      |  CAST(SUM(nu) AS BIGINT) AS total_unique_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(FLOOR(SUM(nt) * 1.0 / COUNT(*) * 100 + 0.5) AS BIGINT)
      |    / 100.0 AS avg_tokens,
      |  CAST(FLOOR(100.0 * SUM(nu) / SUM(nt) * 100 + 0.5) AS BIGINT)
      |    / 100.0 AS ttr_pct
      |FROM t GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    // Tokenize ONCE into an attribute, then take both sizes from it:
    // `t` is referenced twice and split() is non-cheap, so Catalyst
    // keeps the projection boundary (no CollapseProject re-inline) and
    // the document is tokenized once per row, not once per use. The
    // repartition parallelizes the single-file scan (NOTES_r1 #5) —
    // without it this whole per-row stage runs in ONE task (measured:
    // the round-2 "random 10-30s stall" was exactly this query family
    // running serial + re-evaluating split per expression occurrence).
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("source"), length(col("text")).as("n_chars"),
        Text.tokens(col("text")).as("t"))
      .select(col("source"), col("n_chars"),
        size(col("t")).as("nt"), size(array_distinct(col("t"))).as("nu"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nu")).as("total_unique_tokens"),
        sum(col("n_chars")).as("total_chars"),
        graft.functions.Exact.round2(
          sum(col("nt")) * lit(1.0) / count(lit(1))).as("avg_tokens"),
        graft.functions.Exact.round2(
          lit(100.0) * sum(col("nu")) / sum(col("nt"))).as("ttr_pct"))
      .orderBy("source")
  }

  /** q30 — heuristic language ID (stopword-marker argmax with a pinned
    * tie-break order) cross-tabulated against the labeled lang. */
  val q30 = QueryDef(
    "q30_lang_id", {
      val scores = Text.langMarkers.map { case (l, m) =>
        val list = m.map(w => s"'$w'").mkString("[", ",", "]")
        s"len(list_filter(t, x -> list_contains($list, x))) AS s_$l"
      }.mkString(", ")
      val langs = Text.langMarkers.map(_._1)
      val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pick = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      s"""WITH tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t
        |  FROM documents),
        |sc AS (SELECT doc_id, lang, $scores FROM tok),
        |m AS (SELECT *, $mx AS mx FROM sc),
        |p AS (SELECT lang,
        |  CASE WHEN mx = 0 THEN 'und' $pick END AS lang_pred FROM m)
        |SELECT lang, lang_pred, COUNT(*) AS n
        |FROM p GROUP BY lang, lang_pred
        |ORDER BY lang, lang_pred""".stripMargin
    }) { (s, d) =>
    // Staged projections, mirroring the oracle's CTE chain: tokens →
    // per-language scores → scalar argmax. A single inlined
    // `langId(tokens(text))` expression references the token array in
    // ~10 places and each interpreted HOF occurrence re-evaluates
    // split(text) (measured at 10-30× the rest of the pipeline); with
    // the scores materialized as int columns the argmax is pure scalar
    // codegen and split runs once per row.
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("lang"), Text.tokens(col("text")).as("t"))
      .select(col("lang") +: Text.langMarkers.map { case (l, m) =>
        Text.langScore(col("t"), m).as(s"s_$l")
      }: _*)
      .select(col("lang"),
        Text.langPick(Text.langMarkers.map { case (l, _) =>
          l -> col(s"s_$l")
        }).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")
  }

  /** q31 — token counting, whitespace vs BPE-ish regex segmentation
    * ([a-z0-9]+ word pieces), per source. Demonstrates regex token
    * accounting with exact integer arithmetic. */
  val q31 = QueryDef(
    "q31_token_count",
    """WITH t AS (
      |  SELECT source,
      |    len(string_split(text, ' ')) AS ws_tokens,
      |    len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
      |    list_sum(list_transform(regexp_extract_all(text, '[a-z0-9]+'),
      |      x -> length(x))) AS re_chars
      |  FROM documents)
      |SELECT source,
      |  CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(re_tokens) AS BIGINT) AS re_tokens,
      |  CAST(SUM(re_chars) AS BIGINT) AS re_chars
      |FROM t GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    // Materialize the regex token array once (referenced twice below —
    // same CollapseProject reasoning as q29), and parallelize the scan.
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("source"),
        size(Text.tokens(col("text"))).as("ws_tokens"),
        expr("regexp_extract_all(text, '[a-z0-9]+', 0)").as("re"))
      .select(col("source"), col("ws_tokens"),
        size(col("re")).as("re_tokens"),
        aggregate(transform(col("re"), x => length(x)), lit(0),
          (a, x) => a + x).as("re_chars"))
      .groupBy(col("source"))
      .agg(sum(col("ws_tokens")).as("ws_tokens"),
        sum(col("re_tokens")).as("re_tokens"),
        sum(col("re_chars")).as("re_chars"))
      .orderBy("source")
  }

  /** q41 — per-token corpus analytics via a Generator (SURVEY §2.9:
    * `explode` is how the reference's per-tag/preference analytics
    * land in Spark): explode the token array, then one shuffle on the
    * token key for document frequency + term frequency, top-25 by a
    * fully-pinned order. The explode fans out ~tokens-per-doc × docs
    * rows, but it feeds straight into a partial-aggregating groupBy —
    * no wide row ever materializes, which is the correct 100-TB shape
    * for vocabulary statistics. */
  val q41 = QueryDef(
    "q41_token_explode",
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents)
      |SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
      |FROM t GROUP BY token
      |ORDER BY tf DESC, token
      |LIMIT 25""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token"))
      .limit(25)
  }

  /** q46 — per-document quality scoring (the curation filter:
    * length + punctuation-ratio + stopword-ratio, reference-style
    * heuristics): score = 0.4·min(tokens/100, 1) +
    * 0.3·(1 − min(5·punct_ratio, 1)) + 0.3·min(10·stop_ratio, 1),
    * bucketed high/medium/low. Bounded slice for the oracle; the
    * expression is pure per-row projection (one tokenize, staged
    * columns — no HOF re-eval), so the unbounded form is the actual
    * corpus-scale filter. Double arithmetic mirrors the oracle's
    * expression tree exactly, so values are bitwise identical. */
  val q46 = QueryDef(
    "q46_doc_quality", {
      val stop = Text.langMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 200),
        |m AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tokens,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |      * 1.0 / GREATEST(length(text), 1) AS pr_raw,
        |    len(list_filter(toks, x -> x IN ($stop)))
        |      * 1.0 / GREATEST(len(toks), 1) AS sr_raw
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(FLOOR(pr_raw * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pr,
        |    CAST(FLOOR(sr_raw * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS sr
        |  FROM m),
        |sc AS (
        |  SELECT doc_id, n_tokens, pr, sr,
        |    0.4 * LEAST(n_tokens / 100.0, 1.0)
        |      + 0.3 * (1.0 - LEAST(pr * 5.0, 1.0))
        |      + 0.3 * LEAST(sr * 10.0, 1.0) AS score
        |  FROM r)
        |SELECT doc_id, n_tokens, pr AS punct_ratio, sr AS stop_ratio,
        |  CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) / 1000000.0
        |    AS quality_score,
        |  CASE WHEN score >= 0.7 THEN 'high'
        |       WHEN score >= 0.4 THEN 'medium'
        |       ELSE 'low' END AS quality_bucket
        |FROM sc
        |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    // Shared scoring implementation ([[graft.curation.Curation]] —
    // Exact.roundP on every quotient, the q20/q21 halfway lesson);
    // the CurationJob applies the same transform corpus-wide, so the
    // pipeline stage is exactly what this oracle verifies.
    graft.curation.Curation
      .qualityScored(Tables.documents(s, d).filter(col("doc_id") < 200))
      .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio",
        "quality_score", "quality_bucket")
      .orderBy("doc_id")
  }

  /** q48 — deterministic stratified sampling (the "domain mixing"
    * op of a training-data pipeline): per-source keep rates applied by
    * a pure content hash of the key, so the sample is reproducible
    * across runs, engines, partitionings and scales — no RNG state,
    * no seed plumbing, membership decidable per row in isolation
    * (which is what makes it work as a pushed-down filter on a
    * 100-TB scan). Keep iff u32(md5(doc_id)) mod 1000 < rate(source);
    * rates are the mixing weights (src0 50%, src1 25%, rest 10%). */
  val q48 = QueryDef(
    "q48_stratified_sample",
    s"""WITH h AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx
      |  FROM documents),
      |u AS (SELECT doc_id, source, ${hexU32Sql(1)} AS u32 FROM h)
      |SELECT doc_id, source FROM u
      |WHERE u32 % 1000 < (CASE source WHEN 'src0' THEN 500
      |  WHEN 'src1' THEN 250 ELSE 100 END)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.curation.Curation.stratifiedSample(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        Map("src0" -> 500, "src1" -> 250), defaultPerMill = 100)
      .orderBy("doc_id")
  }

  /** q49 — repetition statistics (the Gopher/C4-style repetition
    * filters): per-document repeated-token fraction and top-token
    * dominance. One explode + two-level hash aggregation — partial
    * counts combine map-side, the only shuffle key is (doc_id, token),
    * and nothing is quadratic in document length. */
  val q49 = QueryDef(
    "q49_repetition_stats",
    """WITH ex AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_unique, CAST(MAX(c) AS BIGINT) AS top_count
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n_tokens, n_unique, top_count,
      |  CAST(FLOOR(100.0 * (n_tokens - n_unique) / n_tokens * 100 + 0.5)
      |    AS BIGINT) / 100.0 AS rep_pct,
      |  CAST(FLOOR(100.0 * top_count / n_tokens * 100 + 0.5)
      |    AS BIGINT) / 100.0 AS top_pct
      |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_unique"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_tokens"), col("n_unique"),
        col("top_count"),
        graft.functions.Exact.round2(lit(100.0)
          * (col("n_tokens") - col("n_unique")) / col("n_tokens"))
          .as("rep_pct"),
        graft.functions.Exact.round2(lit(100.0)
          * col("top_count") / col("n_tokens")).as("top_pct"))
      .orderBy("doc_id")
  }

  /** q50 — the corpus-level MinHash+LSH DEDUP materialization: where
    * q24 reports near-duplicate PAIRS, this answers the pipeline
    * question — which documents SURVIVE. Same band candidates + exact
    * shingle-Jaccard verify ≥ 0.8, then the deterministic
    * order-independent keep rule shared with q42/q47: drop a document
    * iff ANY lower-id document is a verified near-duplicate (dropped
    * or not). Candidate generation runs on the native
    * [[org.apache.spark.sql.graft.LshJoin]] operator over the
    * composite band key — one shuffle + one sort, capped per-bucket
    * fan-out. Documents too short to shingle (< 3 tokens) have no
    * candidates and always survive, on both engines. */
  /** Oracle CTE chain up to `jac` (da, db, shingle-Jaccard j) — the
    * band-candidate + exact-verify pipeline shared by q50 and q66. */
  /** Shared band/set oracle CTEs (signatures, per-band keys, shingle
    * sets) — the common prefix of the pairwise dedup oracles
    * ([[lshJacCteSql]]) and the bipartite incremental dedup (q107). */
  private def bandSetsCteSql: String = {
    val sigCols = (0 until K)
      .map(j => s"min((a + $j * hb) % 4294967296) AS mh$j").mkString(", ")
    // band b covers signature rows [b*R, b*R + R) — written R*b+r to
    // match the Spark twin; B*b+r only coincides because B == R here
    val bandCase = (0 until B).map { b =>
      val cat = (0 until R).map(r => s"CAST(mh${R * b + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"WHEN $b THEN $cat"
    }.mkString(" ")
    tokCte + ",\n" + abCte +
      s""",
      |sig AS (SELECT doc_id, $sigCols FROM ab GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, b, CASE b $bandCase END AS bsig
      |  FROM sig CROSS JOIN range($B) AS r(b)),
      |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM shl)""".stripMargin
  }

  private def lshJacCteSql: String =
    bandSetsCteSql +
      s""",
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      |jac AS (
      |  SELECT c.da, c.db,
      |    len(list_intersect(sa.st, sb.st)) * 1.0 /
      |      (len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st)))
      |      AS j
      |  FROM cand c
      |  JOIN sets sa ON sa.doc_id = c.da
      |  JOIN sets sb ON sb.doc_id = c.db)""".stripMargin

  /** Verified near-duplicate pairs (da < db, shingle-Jaccard ≥ 0.8):
    * native-operator band candidates + exact verify — the engine-side
    * twin of [[lshJacCteSql]], shared by q50 (drop rule) and q66
    * (duplicate-group components). */
  /** Per-document band keys `(doc_id, bkey)` — the Spark twin of the
    * oracle's `bands` CTE (bkey = "b|r0,r1,..." collapses the (b,
    * bsig) equi-join pair into one key column). */
  private def bandTable(shl: DataFrame): DataFrame = {
    val sig = minhashWide(shl)
    val bandStructs = (0 until B).map { b =>
      val cat = concat_ws(",", (0 until R).map(r => col(s"mh${R * b + r}")): _*)
      struct(lit(b).as("b"), cat.as("bsig"))
    }
    sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"),
        concat_ws("|", col("bs.b"), col("bs.bsig")).as("bkey"))
  }


  /** Band-bucket candidate pairs (da < db, distinct) via a plain bkey
    * self-join — the declarative twin of the native
    * `LshJoin.bucketPairs` path [[nearDupPairs]] uses (q24/q109 keep
    * this form as the native operator's independent cross-check). */
  private def selfBandPairs(bands: DataFrame): DataFrame =
    bands.as("x")
      .join(bands.as("y"),
        col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()

  /** Attach both sides' shingle sets to (da, db) candidates —
    * `(da, db, sta, stb)`, the verify stage's input. `cand` is
    * bounded by the LSH band contract, hence the broadcast hint. */
  private def pairSets(cand: DataFrame, sets: DataFrame): DataFrame =
    sets.join(broadcast(cand), col("doc_id") === col("da"))
      .select(col("da"), col("db"), col("st").as("sta"))
      .join(sets.select(col("doc_id"), col("st").as("stb")),
        col("doc_id") === col("db"))
      .select(col("da"), col("db"), col("sta"), col("stb"))

  private def nearDupPairs(s: SparkSession, d: String): DataFrame = {
    val shl = persistedShingles(s, d)
    val cand = org.apache.spark.sql.graft.LshJoin
      .bucketPairs(bandTable(shl), "bkey", "doc_id")
      .select(col("a_doc_id").as("da"), col("b_doc_id").as("db"))
      .distinct()
    pairSets(cand, shingleSets(shl))
      .filter(jaccard(col("sta"), col("stb")) >= JAC_T)
      .select(col("da"), col("db"))
  }

  val q50 = QueryDef(
    "q50_text_dedup_lsh",
    lshJacCteSql +
      """,
      |drops AS (SELECT DISTINCT db FROM jac WHERE j >= 0.8)
      |SELECT doc_id FROM documents
      |WHERE doc_id NOT IN (SELECT db FROM drops)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val drops = nearDupPairs(s, d)
      .select(col("db").as("doc_id")).distinct()
    Tables.documents(s, d).select(col("doc_id"))
      .join(drops, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** q66 — near-duplicate GROUPS: connected components over the
    * verified near-dup pair graph ([[nearDupPairs]]), labeling every
    * involved document with the minimum doc_id of its duplicate
    * cluster — the transitive-closure step (chains A~B~C collapse to
    * one cluster) a keep-one-per-group dedup needs, which the
    * pairwise drop rule (q50) under-merges by design. Engine side:
    * [[graft.functions.Components]] iterative min-label propagation
    * (one keyed join + min-agg per round, rounds = graph diameter).
    * Oracle: recursive-CTE reachability with MIN over sources. */
  val q66 = QueryDef(
    "q66_dedup_components", {
      val recursive =
        lshJacCteSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
      recursive +
        """,
        |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM prs
        |        UNION SELECT db, da FROM prs),
        |reach(src, node) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.node = e.a)
        |SELECT node AS doc_id, MIN(src) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    graft.functions.Components
      .connectedComponents(nearDupPairs(s, d), "da", "db")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** 64-token windows at stride 32 per document — shared by q57
    * (materialization) and q59 (cross-document chunk dedup), via the
    * [[graft.curation.Curation]] module the CurationJob composes. */
  private def chunkTable(s: SparkSession, d: String): DataFrame =
    graft.curation.Curation.chunks(Tables.documents(s, d))

  /** The q57/q59 chunk CTE mirrored for DuckDB. */
  private val chunkCte =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    unnest(range(0, greatest(len(toks), 1), 32)) AS start, toks
      |  FROM t),
      |chunks AS (
      |  SELECT doc_id, CAST(start/32 AS BIGINT) AS chunk_idx,
      |    len(toks[start+1 : start+64]) AS n_chunk_tokens,
      |    md5(array_to_string(toks[start+1 : start+64], ' ')) AS chunk_hash
      |  FROM c)""".stripMargin

  val q57 = QueryDef(
    "q57_token_chunks",
    chunkCte +
      """
      |SELECT doc_id, chunk_idx, n_chunk_tokens, chunk_hash
      |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    chunkTable(s, d).orderBy("doc_id", "chunk_idx")
  }

  /** q59 — cross-document chunk dedup: global exact dedup on the q57
    * chunk hashes, keeping the first occurrence by (doc_id,
    * chunk_idx) — the window-level dedup pass (RefinedWeb-style) that
    * runs AFTER document-level dedup to strip shared spans. One
    * shuffle on chunk_hash for the keep-first window, one on doc_id
    * for the per-doc rollup; survival ratio quantifies residual
    * inter-document redundancy. */
  val q59 = QueryDef(
    "q59_chunk_dedup",
    chunkCte +
      """,
      |k AS (
      |  SELECT doc_id, chunk_hash,
      |    ROW_NUMBER() OVER (PARTITION BY chunk_hash
      |      ORDER BY doc_id, chunk_idx) AS rn
      |  FROM chunks)
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunkTable(s, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  /** q67 — deterministic per-source QUOTA sampling
    * ([[graft.curation.Curation.quotaSample]]): exactly 30 documents
    * per source by content-hash order — the fixed-budget balanced mix
    * next to q48's rate-based sampling. */
  val q67 = QueryDef(
    "q67_quota_sample",
    """WITH r AS (
      |  SELECT doc_id, source, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source FROM r WHERE rn <= 30
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.curation.Curation.quotaSample(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "source", 30)
      .orderBy("doc_id")
  }

  /** q70 — quality-weighted sampling
    * ([[graft.curation.Curation.weightedSample]]): keep probability =
    * the q46 quality score, decided by content hash (deterministic,
    * row-local, engine-portable) — the importance-mixing move of an
    * LLM data recipe (upweight high-quality domains without hard
    * cuts). Output: per-bucket kept/total. */
  val q70 = QueryDef(
    "q70_weighted_sample", {
      val stop = Text.langMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tokens,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |      * 1.0 / GREATEST(length(text), 1) AS pr_raw,
        |    len(list_filter(toks, x -> x IN ($stop)))
        |      * 1.0 / GREATEST(len(toks), 1) AS sr_raw
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(FLOOR(pr_raw * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pr,
        |    CAST(FLOOR(sr_raw * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS sr
        |  FROM m),
        |sc AS (
        |  SELECT doc_id,
        |    0.4 * LEAST(n_tokens / 100.0, 1.0)
        |      + 0.3 * (1.0 - LEAST(pr * 5.0, 1.0))
        |      + 0.3 * LEAST(sr * 10.0, 1.0) AS score
        |  FROM r),
        |w AS (
        |  SELECT doc_id,
        |    CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) / 1000000.0
        |      AS quality_score,
        |    CASE WHEN score >= 0.7 THEN 'high'
        |         WHEN score >= 0.4 THEN 'medium'
        |         ELSE 'low' END AS quality_bucket,
        |    (${hexU32Sql(1).replace("hx", "hxd")} % 1000000) * 1.0
        |      / 1000000.0 AS u
        |  FROM (SELECT sc.*, md5(CAST(doc_id AS VARCHAR)) AS hxd FROM sc))
        |SELECT quality_bucket, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (WHERE u < quality_score) AS n_kept
        |FROM w GROUP BY quality_bucket ORDER BY quality_bucket""".stripMargin
    }) { (s, d) =>
    val scored = graft.curation.Curation
      .qualityScored(Tables.documents(s, d))
    val kept = graft.curation.Curation
      .weightedSample(scored, "quality_score")
      .select(col("doc_id")).withColumn("kept", lit(1))
    scored.join(kept, Seq("doc_id"), "left")
      .groupBy(col("quality_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("kept")).as("n_kept"))
      .orderBy("quality_bucket")
  }

  /** q73 — blocklist token scrub
    * ([[graft.curation.Curation.blocklistScrub]]): the C4-style
    * bad-words curation filter — count blocklisted tokens per
    * document, flag documents where they exceed 5% of tokens, report
    * per-source totals. The scrub itself is a pure per-row projection
    * (no shuffle); only the 20-group report aggregates. At 100 TB the
    * per-source report is a map-side-combined single shuffle over ~as
    * many groups as sources. */
  val q73 = QueryDef(
    "q73_blocklist_scrub",
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, source, len(toks) AS n_tokens,
      |    len(list_filter(toks, x -> x IN ('customer', 'spark')))
      |      AS n_blocked
      |  FROM t)
      |SELECT source, COUNT(*) AS docs,
      |  CAST(SUM(n_blocked) AS BIGINT) AS blocked_tokens,
      |  CAST(SUM(CASE WHEN n_blocked * 20 > n_tokens THEN 1 ELSE 0 END)
      |    AS BIGINT) AS docs_flagged
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    graft.curation.Curation
      .blocklistScrub(Tables.documents(s, d), Seq("customer", "spark"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_blocked")).as("blocked_tokens"),
        sum(when(col("n_blocked") * 20 > col("n_tokens"), 1)
          .otherwise(0)).as("docs_flagged"))
      .orderBy("source")
  }

  /** q76 — inverted-index build with CAPPED posting lists: distinct
    * (token, doc) postings via a per-document `array_distinct` (no
    * distinct shuffle), then a SALT-DECOMPOSED top-20 per token: the
    * min-20 doc_ids of a set equal the min-20 of its per-salt min-20s,
    * so the first window partitions on (token, salt32) — a stopword's
    * postings split across 32 bounded tasks instead of one
    * corpus-sized sort (the q12-class skew fix) — and the second
    * window ranks only ≤32·20 survivors per token. The cap bounds
    * both state and output at ANY corpus size; `df` (true document
    * frequency) comes from a map-side-combined count, immune to skew
    * by partial aggregation. */
  val q76 = QueryDef(
    "q76_inverted_index",
    """WITH t AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |rk AS (
      |  SELECT token, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY token) AS df
      |  FROM t)
      |SELECT token, MAX(df) AS df,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
      |    AS postings
      |FROM rk WHERE rn <= 20 GROUP BY token ORDER BY token""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(Text.tokens(col("text")))).as("token"))
      val wSalt = Window
        .partitionBy(col("token"), pmod(col("doc_id"), lit(32)))
        .orderBy(col("doc_id"))
      val wTok = Window.partitionBy(col("token")).orderBy(col("doc_id"))
      val df = t.groupBy(col("token")).agg(count(lit(1)).as("df"))
      t.withColumn("rs", row_number().over(wSalt))
        .filter(col("rs") <= 20) // ≤ 32·20 rows/token survive
        .withColumn("rn", row_number().over(wTok))
        .filter(col("rn") <= 20)
        .groupBy(col("token"))
        .agg(array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",").as("postings"))
        .join(df, Seq("token"))
        .select(col("token"), col("df"), col("postings"))
        .orderBy("token")
  }

  /** q77 — TF-IDF-style term weighting, top-3 terms per document.
    * The cross-engine weight is the EXACT integer
    * `tf * 1_000_000 div df` (monotone in tf/df; the float
    * `tf·ln(N/df)` form would hinge on libm `log` ulp agreement
    * between JVM and DuckDB, which nothing guarantees — SURVEY §6
    * portability stance). Plan: one explode feeding two partial-agg
    * groupBys (tf by (doc, token), df by token), a shuffle equi-join
    * on token (AQE broadcasts the vocab side when small — vocab grows
    * by Heaps' law, so no unconditional broadcast hint), then a
    * row_number window per doc. */
  val q77 = QueryDef(
    "q77_tfidf_top_terms",
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |sc AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    (tf.tf * 1000000) // df.df AS weight
      |  FROM tf JOIN df USING (token)),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY weight DESC, token) AS rn
      |  FROM sc)
      |SELECT doc_id, token, tf, df, weight
      |FROM rk WHERE rn <= 3
      |ORDER BY doc_id, weight DESC, token""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val tf = t.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("token"))
    tf.join(df, Seq("token"))
      .withColumn("weight", expr("(tf * 1000000) div df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("weight"))
      .orderBy(col("doc_id"), col("weight").desc, col("token"))
  }

  /** q79 — canonical-representative selection per near-duplicate
    * cluster: the keep rule a production dedup applies AFTER q66's
    * connected components — keep the richest member (max `n_chars`,
    * tie → min doc_id) of each duplicate group. Engine: the q66
    * component labels joined back to document metadata, one
    * row_number window per component (components are tiny by
    * construction, so the window state is bounded). Completes the
    * find-pairs → cluster → canonicalize dedup pipeline. */
  val q79 = QueryDef(
    "q79_canonical_docs", {
      val recursive =
        lshJacCteSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
      recursive +
        """,
        |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM prs
        |        UNION SELECT db, da FROM prs),
        |reach(src, node) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.node = e.a),
        |comp AS (
        |  SELECT node AS doc_id, MIN(src) AS component
        |  FROM reach GROUP BY node),
        |m AS (
        |  SELECT c.component, c.doc_id, d.n_chars
        |  FROM comp c JOIN documents d USING (doc_id)),
        |rk AS (
        |  SELECT component, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY component) AS n_members
        |  FROM m)
        |SELECT component, doc_id AS canonical_doc, n_chars, n_members
        |FROM rk WHERE rn = 1 ORDER BY component""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val comp = graft.functions.Components
      .connectedComponents(nearDupPairs(s, d), "da", "db")
      .withColumnRenamed("id", "doc_id")
    val m = comp.join(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      Seq("doc_id"))
    val wOrd = Window.partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wAll = Window.partitionBy(col("component"))
    m.withColumn("rn", row_number().over(wOrd))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("canonical_doc"),
        col("n_chars"), col("n_members"))
      .orderBy("component")
  }

  /** q84 — PII redaction ([[graft.curation.Curation.redactPii]])
    * under a full oracle. The corpus itself carries no PII (documented
    * since r3), so the query derives a deterministic PII-bearing
    * fixture from `documents` IN the query — every doc_id % 3 gains a
    * synthetic email, every doc_id % 5 a synthetic phone, both
    * reproducible by DuckDB from the same table — then runs the real
    * redaction operator over it and reports per-source scrub counts
    * plus the redacted-text character total (which pins the
    * replacement itself, not just the match counts). Regexes are
    * RE2-compatible by design so both engines see identical matches.
    * Scale: per-row regex projection, one map-side-combined shuffle
    * over ~|sources| groups. */
  val q84 = QueryDef(
    "q84_pii_scrub",
    """WITH aug AS (
      |  SELECT doc_id, source,
      |    text ||
      |      CASE WHEN doc_id % 3 = 0
      |        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |        ELSE '' END ||
      |      CASE WHEN doc_id % 5 = 0
      |        THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |        ELSE '' END AS text
      |  FROM documents),
      |es AS (
      |  SELECT doc_id, source, text,
      |    regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |      '<EMAIL>', 'g') AS email_scrubbed
      |  FROM aug),
      |r AS (
      |  -- phones counted on the EMAIL-REDACTED text, mirroring the
      |  -- operator: a phone inside an email-shaped token is consumed
      |  -- by the email pass and must not be double-counted
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |    len(regexp_extract_all(email_scrubbed,
      |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS n_phones,
      |    length(regexp_replace(email_scrubbed,
      |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')) AS rlen
      |  FROM es)
      |SELECT source, COUNT(*) AS docs,
      |  CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
      |  CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
      |  CAST(SUM(rlen) AS BIGINT) AS redacted_chars
      |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val aug = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        concat(
          col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(""),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-123-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise("")).as("text"))
    graft.curation.Curation.redactPii(aug)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_emails")).as("emails_redacted"),
        sum(col("n_phones")).as("phones_redacted"),
        sum(length(col("redacted_text")).cast("long"))
          .as("redacted_chars"))
      .orderBy("source")
  }

  /** q104 — maximal duplicated-span extraction (exact substring-level
    * dedup, the token-window treatment): hash every 8-token window
    * with its position, keep windows shared by >= 2 documents, then
    * merge overlapping/adjacent windows per document into maximal
    * spans (gaps-and-islands: a new island starts when the next
    * window start jumps past the previous window's coverage). Report
    * the top-20 docs by duplicated-span token mass — the rows an
    * exact-substring dedup pass would cut or rewrite.
    *
    * Scale shape: one keyed agg on the window hash (the df census),
    * one equi-join back, then windows PARTITIONED BY doc_id — every
    * stage keys on hash or doc_id, nothing global. The 8-gram
    * position stream is the same corpus-sized explode q57/q59 already
    * run; the island merge input is only the SHARED positions (tiny
    * after the df filter). */
  /** q140 — normalization-revealed dedup gain
    * ([[graft.curation.Curation.normalizeText]] — the C4/RefinedWeb
    * "fuzzy exact" key): per source, distinct byte-exact content
    * hashes vs distinct NORMALIZED-content hashes; the gap is the
    * count of trivially-reformatted duplicates (case / punctuation /
    * spacing copies) that byte-exact dedup (q22) misses and the
    * normalized key catches. The report a curation run reads to
    * decide whether the normalized pass pays for itself before the
    * expensive near-dup stages. Two per-row hash projections + one
    * keyed agg — a free rider on any scan at 100 TB. */
  val q140 = QueryDef(
    "q140_norm_dedup_gain",
    s"""WITH h AS (
      |  SELECT source, md5(text) AS raw_h,
      |    md5(${graft.curation.Curation.normalizeTextSql("text")})
      |      AS norm_h
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT raw_h) AS raw_distinct,
      |  COUNT(DISTINCT norm_h) AS norm_distinct,
      |  CAST(COUNT(DISTINCT raw_h) - COUNT(DISTINCT norm_h) AS BIGINT)
      |    AS revealed_dups
      |FROM h GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("raw_h"),
        md5(graft.curation.Curation.normalizeText(col("text")))
          .as("norm_h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_h")).as("raw_distinct"),
        countDistinct(col("norm_h")).as("norm_distinct"),
        (countDistinct(col("raw_h")) - countDistinct(col("norm_h")))
          .as("revealed_dups"))
      .orderBy("source")
  }

  /** Shared oracle CTE chain for q104/q137: positioned 8-gram table →
    * shared-gram filter → gaps-and-islands merge, ending at
    * `sp(doc_id, island, s, e2)` (token-position spans, inclusive). */
  private val dupSpanCteSql =
    """WITH l AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |e AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
      |  FROM l WHERE len(toks) >= 8),
      |g AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |    md5(list_aggregate(toks[CAST(i AS INT):CAST(i AS INT) + 7],
      |      'string_agg', ' ')) AS h
      |  FROM e),
      |sh AS (SELECT h FROM g GROUP BY h
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |p AS (SELECT g.doc_id, g.i FROM g JOIN sh ON g.h = sh.h),
      |isl AS (
      |  SELECT doc_id, i,
      |    CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
      |         THEN 1 ELSE 0 END AS brk
      |  FROM p),
      |isl2 AS (
      |  SELECT doc_id, i,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM isl),
      |sp AS (
      |  SELECT doc_id, island, MIN(i) AS s, MAX(i) + 7 AS e2
      |  FROM isl2 GROUP BY doc_id, island)""".stripMargin

  /** Engine side of [[dupSpanCteSql]]: maximal duplicated spans
    * (doc_id, s, e2) in token positions. The positioned gram table
    * feeds BOTH the df census and the join-back probe: persisted
    * rather than tokenize+md5 the corpus twice (the Ranks
    * multi-consumer rule; at 100 TB this is the gram index you would
    * materialize once anyway — Bench/Verify clearCache between
    * queries bounds retention). Every stage keys on hash or doc_id. */
  private def dupSpans(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")) - 7)).as("i"),
        col("toks"))
      .select(col("doc_id"), col("i").cast("long").as("i"),
        md5(array_join(slice(col("toks"), col("i"), lit(8)), " "))
          .as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = g.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val p = g.join(sh, Seq("h")).select(col("doc_id"), col("i"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val cum = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("brk",
        when(col("i") - lag(col("i"), 1).over(w) > 8, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(cum))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).as("s"), (max(col("i")) + 7).as("e2"))
      .select(col("doc_id"), col("s"), col("e2"))
  }

  val q104 = QueryDef(
    "q104_dup_spans",
    dupSpanCteSql +
      """
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(e2 - s + 1) AS BIGINT) AS dup_tokens
      |FROM sp GROUP BY doc_id
      |ORDER BY dup_tokens DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    dupSpans(s, d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e2") - col("s") + 1).as("dup_tokens"))
      .orderBy(col("dup_tokens").desc, col("doc_id"))
      .limit(20)
  }

  /** q137 — duplicated-span REMOVAL census (the cut step completing
    * q104's find step — Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499: cut exact
    * duplicated substrings above a length floor out of the corpus):
    * spans of ≥ 16 tokens are cut from EVERY occurrence (the paper's
    * rule — the span survives nowhere; sub-floor spans are left
    * alone to avoid shredding fluent text). Per-source audit: total
    * tokens, removed tokens, docs touched, and removal ppm — the
    * budget numbers a dedup pass reports before committing the
    * rewrite. Same scale shape as q104 (the span frame) plus one
    * left join back to per-doc token counts and a keyed census. */
  val q137 = QueryDef(
    "q137_span_removal",
    dupSpanCteSql +
      """,
      |cut AS (
      |  SELECT doc_id, CAST(SUM(e2 - s + 1) AS BIGINT) AS cut_tokens
      |  FROM sp WHERE e2 - s + 1 >= 16 GROUP BY doc_id),
      |tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT source,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(COALESCE(SUM(cut_tokens), 0) AS BIGINT) AS removed_tokens,
      |  CAST(COUNT(cut_tokens) AS BIGINT) AS docs_touched,
      |  CAST(COALESCE(SUM(cut_tokens), 0) * 1000000 // SUM(n_tokens)
      |    AS BIGINT) AS removal_ppm
      |FROM tok LEFT JOIN cut USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val cut = dupSpans(s, d)
      .filter(col("e2") - col("s") + 1 >= 16)
      .groupBy(col("doc_id"))
      .agg(sum(col("e2") - col("s") + 1).as("cut_tokens"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(cut, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("total_tokens"),
        coalesce(sum(col("cut_tokens")), lit(0L)).as("removed_tokens"),
        count(col("cut_tokens")).as("docs_touched"),
        expr("coalesce(sum(cut_tokens), 0) * 1000000" +
          " div sum(n_tokens)").as("removal_ppm"))
      .orderBy("source")
  }

  /** q107 — incremental dedup of an incoming batch against an
    * existing corpus index (the realistic crawl-ingest shape: a new
    * snapshot is deduped against what's already stored, NOT by
    * re-deduping the whole corpus): odd doc_ids play the incoming
    * batch, even doc_ids the index. Two stages, both keyed and
    * bipartite — never an index self-join: (1) exact content-hash
    * containment (anti-join on md5); (2) LSH band-key equi-join
    * incoming×index, shingle-Jaccard >= 0.8 verify on candidates only
    * (q50's drop rule applied cross-corpus). Per-source funnel:
    * incoming, exact dups, near dups (excluding exact), kept. At
    * 100 TB the index side is a stored hash/band table — this query
    * reads documents for it only because the testdata has no
    * persisted index. */
  val q107 = QueryDef(
    "q107_incremental_dedup",
    bandSetsCteSql +
      """,
      |inc AS (SELECT doc_id, source, md5(text) AS h
      |  FROM documents WHERE doc_id % 2 = 1),
      |ih AS (SELECT DISTINCT md5(text) AS h
      |  FROM documents WHERE doc_id % 2 = 0),
      |exact AS (SELECT DISTINCT inc.doc_id FROM inc
      |  JOIN ih ON inc.h = ih.h),
      |bc AS (
      |  SELECT DISTINCT x.doc_id AS di, y.doc_id AS dx
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bsig = y.bsig
      |  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0),
      |bj AS (
      |  SELECT c.di,
      |    len(list_intersect(sa.st, sb.st)) * 1.0 /
      |      (len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st)))
      |      AS j
      |  FROM bc c
      |  JOIN sets sa ON sa.doc_id = c.di
      |  JOIN sets sb ON sb.doc_id = c.dx),
      |near AS (SELECT DISTINCT di AS doc_id FROM bj WHERE j >= 0.8
      |  AND di NOT IN (SELECT doc_id FROM exact))
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_incoming,
      |  CAST(SUM(CASE WHEN inc.doc_id IN (SELECT doc_id FROM exact)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  CAST(SUM(CASE WHEN inc.doc_id IN (SELECT doc_id FROM near)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
      |  CAST(SUM(CASE WHEN inc.doc_id NOT IN (SELECT doc_id FROM exact)
      |    AND inc.doc_id NOT IN (SELECT doc_id FROM near)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM inc GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val inc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val ih = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("h")).distinct()
    val exact = inc.join(ih, Seq("h")).select(col("doc_id")).distinct()
    val shl = persistedShingles(s, d)
    val bands = bandTable(shl)
    val cand = bands.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("da"), col("bkey"))
      .join(bands.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("db"), col("bkey")), Seq("bkey"))
      .select(col("da"), col("db")).distinct()
    val near = pairSets(cand, shingleSets(shl))
      .filter(jaccard(col("sta"), col("stb")) >= JAC_T)
      .select(col("da").as("doc_id")).distinct()
      .join(exact, Seq("doc_id"), "left_anti")
    inc
      .join(exact.withColumn("is_exact", lit(1L)), Seq("doc_id"), "left")
      .join(near.withColumn("is_near", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact_dup"),
        sum(coalesce(col("is_near"), lit(0L))).as("n_near_dup"),
        sum(when(col("is_exact").isNull && col("is_near").isNull, 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** q109 — shingle containment census (ASYMMETRIC overlap,
    * |A∩B| / min|set|, in exact integer ppm) over the LSH band
    * candidates: the quote-detection metric — a document wholly
    * embedded in a longer one scores containment 1.0 while its
    * symmetric Jaccard can sit far below any dedup threshold, so a
    * Jaccard-only pipeline keeps the pair. Reported next to Jaccard
    * for the top-20 candidates; candidates come from the same band
    * join as q24 (never all-pairs), so the census rides the existing
    * LSH machinery at no extra shuffle. */
  val q109 = QueryDef(
    "q109_containment",
    bandSetsCteSql +
      s""",
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      |m AS (
      |  SELECT c.da, c.db,
      |    len(list_intersect(sa.st, sb.st)) AS inter,
      |    len(sa.st) AS la, len(sb.st) AS lb
      |  FROM cand c
      |  JOIN sets sa ON sa.doc_id = c.da
      |  JOIN sets sb ON sb.doc_id = c.db)
      |SELECT da AS doc_a, db AS doc_b,
      |  CAST(inter * 1000000 // LEAST(la, lb) AS BIGINT) AS cont_ppm,
      |  CAST(FLOOR(inter * 1.0 / (la + lb - inter) * 1000000 + 0.5)
      |    AS BIGINT) / 1000000.0 AS jaccard
      |FROM m ORDER BY cont_ppm DESC, doc_a, doc_b
      |LIMIT 20""".stripMargin) { (s, d) =>
    val shl = persistedShingles(s, d)
    val cand = selfBandPairs(bandTable(shl))
    val m = pairSets(cand, shingleSets(shl))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        size(array_intersect(col("sta"), col("stb"))).cast("long")
          .as("inter"),
        size(col("sta")).cast("long").as("la"),
        size(col("stb")).cast("long").as("lb"))
    m.select(col("doc_a"), col("doc_b"),
        expr("inter * 1000000 div LEAST(la, lb)").as("cont_ppm"),
        graft.functions.Exact.roundP(
          col("inter").cast("double")
            / (col("la") + col("lb") - col("inter")), 6).as("jaccard"))
      .orderBy(col("cont_ppm").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** q110 — cross-source overlap matrix: verified near-dup pairs
    * ([[nearDupPairs]], q50's machinery) labeled with their documents'
    * sources and counted per unordered source pair — the provenance
    * view of duplication ("which feeds copy from each other") that
    * decides dedup PRIORITY at corpus scale: a pair of sources with
    * heavy mutual overlap gets a preferred-source keep rule, not a
    * doc-by-doc coin flip. Costs two broadcast-able id→source lookups
    * on top of the pair table. */
  val q110 = QueryDef(
    "q110_source_overlap",
    lshJacCteSql +
      """,
      |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
      |lab AS (
      |  SELECT x.source AS sa, y.source AS sb
      |  FROM prs p
      |  JOIN documents x ON x.doc_id = p.da
      |  JOIN documents y ON y.doc_id = p.db)
      |SELECT LEAST(sa, sb) AS source_a, GREATEST(sa, sb) AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM lab GROUP BY 1, 2
      |ORDER BY n_pairs DESC, source_a, source_b""".stripMargin) {
    (s, d) =>
      val ids = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      val lab = nearDupPairs(s, d)
        .join(ids.withColumnRenamed("source", "sa"),
          col("doc_id") === col("da")).drop("doc_id")
        .join(ids.withColumnRenamed("source", "sb"),
          col("doc_id") === col("db")).drop("doc_id")
      lab.select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
  }

  /** q125 — content-defined chunking (CDC) census: the
    * variable-boundary sibling of q57/q59's fixed-stride chunks. A cut
    * falls wherever the rolling content hash
    * ([[graft.curation.Curation.contentU32]] of the character 8-gram
    * at that offset) ≡ 0 mod 64, so boundaries follow the CONTENT —
    * insert one sentence and only the chunks around the edit change,
    * while fixed-stride chunking shifts every downstream chunk (the
    * storage-dedup property, Muthitacharoen et al. LBFS "A
    * low-bandwidth network file system", SOSP 2001, and the shape
    * modern corpus chunk-dedup wants for crawl re-snapshots). Per
    * source: chunk count, distinct chunk hashes, total chunk chars
    * (must equal total text chars — the partition property), and the
    * duplicated-chunk ratio in exact ppm.
    *
    * Expression shape: ONE md5 per candidate offset inside a single
    * HOF filter (no re-inlined subexpressions — the q23 lambda trap),
    * then a zip_with over (starts, ends) and one explode; one keyed
    * shuffle for the census. The expected chunk length is the modulus
    * (64), the knob production sizes upward (e.g. 2^11 for ~2 KB
    * chunks) — boundaries stay content-local at any scale. */
  val q125 = QueryDef(
    "q125_cdc_chunks", {
      val u32 = hexU32Sql(1).replace("hx", "md5(substr(text, i + 1, 8))")
      s"""WITH c AS (
        |  SELECT doc_id, source, text, length(text) AS L
        |  FROM documents WHERE length(text) >= 8),
        |cu AS (
        |  SELECT doc_id, source, text, L,
        |    list_filter(range(1, greatest(L - 7, 1)),
        |      i -> ($u32) % 64 = 0) AS cs
        |  FROM c),
        |ch AS (
        |  SELECT doc_id, source, text,
        |    list_prepend(0, cs) AS starts,
        |    list_concat(cs, [L]) AS ends
        |  FROM cu),
        |ex AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(starts) + 1),
        |      j -> {'h': md5(substr(text, starts[j] + 1,
        |                     ends[j] - starts[j])),
        |            'l': ends[j] - starts[j]})) AS ck
        |  FROM ch)
        |SELECT source,
        |  COUNT(*) AS n_chunks,
        |  CAST(COUNT(DISTINCT ck.h) AS BIGINT) AS n_distinct,
        |  CAST(SUM(ck.l) AS BIGINT) AS total_chars,
        |  CAST(((COUNT(*) - COUNT(DISTINCT ck.h)) * 1000000)
        |    // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM ex GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .filter(length(col("text")) >= 8)
      .select(col("source"),
        explode(graft.curation.Curation.cdcChunks(col("text"))).as("ck"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("ck.h")).as("n_distinct"),
        sum(col("ck.l")).cast("long").as("total_chars"),
        expr("((count(1) - count(distinct ck.h)) * 1000000L)" +
          " div count(1)").as("dup_ppm"))
      .orderBy("source")
  }

  /** q127 — leakage-free train/eval split: the assignment unit is the
    * near-duplicate GROUP (q66's connected components), not the
    * document — a doc-level hash split leaks eval content into
    * training whenever a near-duplicate pair straddles the cut, which
    * is exactly what benchmark decontamination (q86) exists to catch
    * after the fact. Here the split hash runs on the component label
    * (singletons = own doc_id), so straddling is impossible BY
    * CONSTRUCTION — and the query REPORTS the straddle count instead
    * of asserting it, making the oracle prove the zero. Split rule is
    * the q88 portable hash pair (contentU32 / hexU32Sql), 80/20.
    * Scale: components + one left join + keyed census; the leak audit
    * joins the verified pair list against the split on doc keys. */
  val q127 = QueryDef(
    "q127_leakage_free_split", {
      val recursive =
        lshJacCteSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
      recursive +
        s""",
        |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM prs
        |        UNION SELECT db, da FROM prs),
        |reach(src, node) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.node = e.a),
        |comp AS (
        |  SELECT node AS doc_id, MIN(src) AS component
        |  FROM reach GROUP BY node),
        |g AS (
        |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS gk
        |  FROM documents d LEFT JOIN comp c USING (doc_id)),
        |h AS (SELECT doc_id, gk, md5(CAST(gk AS VARCHAR)) AS hx FROM g),
        |sp AS (
        |  SELECT doc_id, gk,
        |    CASE WHEN ${hexU32Sql(1)} % 10 < 8 THEN 'train'
        |         ELSE 'eval' END AS split
        |  FROM h),
        |lk AS (
        |  SELECT COUNT(*) AS leak_pairs
        |  FROM prs p JOIN sp x ON p.da = x.doc_id
        |              JOIN sp y ON p.db = y.doc_id
        |  WHERE x.split <> y.split)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_groups,
        |  (SELECT CAST(leak_pairs AS BIGINT) FROM lk) AS leak_pairs
        |FROM sp GROUP BY split ORDER BY split""".stripMargin
    }) { (s, d) =>
    val ndp = nearDupPairs(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comp = graft.functions.Components
      .connectedComponents(ndp, "da", "db")
      .withColumnRenamed("id", "doc_id")
    val grouped = Tables.documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("gk"))
    val splitDf = grouped.withColumn("split",
      when(graft.curation.Curation.contentU32(col("gk")) % 10 < 8,
        "train").otherwise("eval"))
    val leak = ndp
      .join(splitDf.select(col("doc_id").as("da"),
        col("split").as("sa")), Seq("da"))
      .join(splitDf.select(col("doc_id").as("db"),
        col("split").as("sb")), Seq("db"))
      .agg(count(when(col("sa") =!= col("sb"), 1)).as("leak_pairs"))
    splitDf.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gk")).as("n_groups"))
      .crossJoin(broadcast(leak))
      .orderBy("split")
  }

  /** q145 — group-aware K-FOLD assignment (q127's two-way split
    * generalized to cross-validation folds): the assignment unit is
    * again the q66 near-dup component, folded 5 ways by the portable
    * content hash of the group key, so near-duplicate documents can
    * never straddle folds — the property that makes k-fold eval
    * numbers honest on a deduplicated-ish corpus. Per-fold census
    * plus the oracle-proven zero straddle count. Same scale shape as
    * q127 (components + one left join + keyed census); fold counts
    * are hash-balanced, not exact-equal, by design (exact balancing
    * would need a global sort). */
  val q145 = QueryDef(
    "q145_kfold_split", {
      val recursive =
        lshJacCteSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
      recursive +
        s""",
        |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM prs
        |        UNION SELECT db, da FROM prs),
        |reach(src, node) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.node = e.a),
        |comp AS (
        |  SELECT node AS doc_id, MIN(src) AS component
        |  FROM reach GROUP BY node),
        |g AS (
        |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS gk
        |  FROM documents d LEFT JOIN comp c USING (doc_id)),
        |h AS (SELECT doc_id, gk, md5(CAST(gk AS VARCHAR)) AS hx FROM g),
        |sp AS (
        |  SELECT doc_id, gk,
        |    CAST(${hexU32Sql(1)} % 5 AS BIGINT) AS fold
        |  FROM h),
        |lk AS (
        |  SELECT COUNT(*) AS leak_pairs
        |  FROM prs p JOIN sp x ON p.da = x.doc_id
        |              JOIN sp y ON p.db = y.doc_id
        |  WHERE x.fold <> y.fold)
        |SELECT fold, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_groups,
        |  (SELECT CAST(leak_pairs AS BIGINT) FROM lk) AS leak_pairs
        |FROM sp GROUP BY fold ORDER BY fold""".stripMargin
    }) { (s, d) =>
    val ndp = nearDupPairs(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comp = graft.functions.Components
      .connectedComponents(ndp, "da", "db")
      .withColumnRenamed("id", "doc_id")
    val folded = Tables.documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("gk"))
      .withColumn("fold",
        graft.curation.Curation.contentU32(col("gk")) % 5)
    val leak = ndp
      .join(folded.select(col("doc_id").as("da"), col("fold").as("fa")),
        Seq("da"))
      .join(folded.select(col("doc_id").as("db"), col("fold").as("fb")),
        Seq("db"))
      .agg(count(when(col("fa") =!= col("fb"), 1)).as("leak_pairs"))
    folded.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gk")).as("n_groups"))
      .crossJoin(broadcast(leak))
      .orderBy("fold")
  }

  /** q128 — edit-distance verification over the LSH candidate frame:
    * the CHARACTER-level second opinion next to the token-shingle
    * Jaccard verify (q24/q50). Levenshtein is order-sensitive where
    * shingle sets are not — a doc whose sentences were reshuffled
    * keeps high Jaccard but loses edit similarity, and a doc with
    * per-word typos keeps edit similarity while its 3-gram shingles
    * collapse — so production dedup reads both signals. Similarity is
    * reported as exact integer ppm of `1 − lev/max(len)`; both
    * engines compute the same classic DP distance, so the oracle is
    * bit-exact. Cost discipline: the O(|a|·|b|) DP runs ONLY on LSH
    * band candidates (never all pairs) — the same bounded-verify
    * contract every dedup stage here follows. */
  val q128 = QueryDef(
    "q128_edit_distance_verify",
    bandSetsCteSql +
      """,
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bands x JOIN bands y
      |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
      |p AS (
      |  SELECT c.da, c.db, ta.text AS xa, tb.text AS xb
      |  FROM cand c JOIN documents ta ON ta.doc_id = c.da
      |              JOIN documents tb ON tb.doc_id = c.db),
      |m AS (
      |  SELECT da, db, levenshtein(xa, xb) AS lv,
      |    greatest(length(xa), length(xb)) AS mx
      |  FROM p)
      |SELECT da, db, CAST(lv AS BIGINT) AS lev,
      |  CAST(((mx - lv) * 1000000) // mx AS BIGINT) AS sim_ppm
      |FROM m ORDER BY sim_ppm DESC, da, db LIMIT 25""".stripMargin) {
    (s, d) =>
      val shl = persistedShingles(s, d)
      val cand = org.apache.spark.sql.graft.LshJoin
        .bucketPairs(bandTable(shl), "bkey", "doc_id")
        .select(col("a_doc_id").as("da"), col("b_doc_id").as("db"))
        .distinct()
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      cand
        .join(docs.select(col("doc_id").as("da"), col("text").as("xa")),
          Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("text").as("xb")),
          Seq("db"))
        .select(col("da"), col("db"),
          levenshtein(col("xa"), col("xb")).cast("long").as("lev"),
          greatest(length(col("xa")), length(col("xb"))).cast("long")
            .as("mx"))
        .select(col("da"), col("db"), col("lev"),
          expr("((mx - lev) * 1000000L) div mx").as("sim_ppm"))
        .orderBy(col("sim_ppm").desc, col("da"), col("db"))
        .limit(25)
  }

  /** Fixed literal query-term set for the BM25 family (q147 here,
    * q151's hybrid re-rank in [[VectorQueries]]). Bounded by contract —
    * the query side of a retrieval probe, never corpus-derived. */
  private[queries] val bmTerms = Seq("spark", "vector", "customer")

  /** q147 — Okapi BM25 document ranking for a bounded query-term set
    * (design, integer port, and scale notes in
    * [[graft.functions.Retrieval]]): the lexical retrieval probe a
    * curation run uses to pull topic slices out of the corpus, top-20
    * docs by summed term score with doc_id tie-breaks. Completes the
    * q76 inverted-index / q77 TF-IDF retrieval surface with the
    * ranking function production search actually uses. */
  val q147 = QueryDef(
    "q147_bm25_rank",
    graft.functions.Retrieval.bm25CteSql(bmTerms) +
      """
        |SELECT doc_id, n_terms, score_u
        |FROM bm ORDER BY score_u DESC, doc_id LIMIT 20""".stripMargin) {
    (s, d) =>
      graft.functions.Retrieval.bm25(Tables.documents(s, d), bmTerms)
        .orderBy(col("score_u").desc, col("doc_id"))
        .limit(20)
  }

  /** q156 — NEAR-DUP-aware benchmark decontamination (the fuzzy
    * complement to q86: exact 8-gram collision catches verbatim
    * leakage, this catches lightly-edited copies of benchmark items —
    * the contamination mode that actually survives format
    * conversions): the held-out "benchmark" slice is doc_id % 10 = 0;
    * a training document is contaminated iff it has a VERIFIED
    * near-dup pair (band candidates → shingle-Jaccard ≥ 0.8, the
    * q50/q66 machinery) with any benchmark document, in either pair
    * direction. Per-source contaminated census. Scale: inherits the
    * LSH contract — candidates from bounded band buckets, never an
    * all-pairs doc comparison; the census is one keyed join + agg. */
  val q156 = QueryDef(
    "q156_lsh_decontamination",
    lshJacCteSql +
      """,
      |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
      |cont AS (
      |  SELECT DISTINCT t FROM (
      |    SELECT da AS t FROM prs WHERE db % 10 = 0 AND da % 10 <> 0
      |    UNION ALL
      |    SELECT db AS t FROM prs WHERE da % 10 = 0 AND db % 10 <> 0))
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS contaminated_docs
      |FROM documents JOIN cont ON doc_id = t
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val prs = nearDupPairs(s, d)
    val cont = prs
      .filter(col("db") % 10 === 0 && col("da") % 10 =!= 0)
      .select(col("da").as("t"))
      .union(prs
        .filter(col("da") % 10 === 0 && col("db") % 10 =!= 0)
        .select(col("db").as("t")))
      .distinct()
    Tables.documents(s, d)
      .join(cont, col("doc_id") === col("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("contaminated_docs"))
      .orderBy("source")
  }

  /** q164 — winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS document-fingerprinting scheme): hash every
    * 5-token gram, then in each sliding window of w=4 consecutive gram
    * hashes select the minimum (rightmost position on ties); the
    * distinct selected (hash, position) pairs are the document's
    * fingerprints. The guarantee that q125's content-defined chunking
    * and plain 0-mod-p sampling LACK: every shared substring of
    * ≥ w+k−1 = 8 tokens is caught by at least one shared fingerprint,
    * while expected density stays ≈ 2/(w+1) — bounded index size WITH
    * a detection floor. Report per source: gram volume, fingerprint
    * count, realized density, and fingerprints shared across ≥2 docs.
    *
    * Portability: the rightmost-tie argmin is encoded as the plain
    * string MIN of `md5hex ∥ zero-padded(10⁹ − pos)` — lexicographic
    * min = (min hash, then max pos) identically in both engines, no
    * argmin/struct-ordering semantics relied on. Docs with 5–7 tokens
    * produce grams but no full window (density slightly under the
    * asymptote) — counted, documented, identical on both sides.
    *
    * Scale: the gram stream is q104's corpus explode; the window is
    * PARTITIONED BY doc_id (bounded by doc length, never global); the
    * shared census keys on the 32-byte hash. Fingerprint selection is
    * embarrassingly parallel — the 100-TB shape is one pass + one
    * keyed agg over an output ~2/(w+1) the gram volume. */
  /** Shared oracle CTE chain for q164/q169: tokenized doc table `l` →
    * positioned 5-gram table `g` → packed winnow key `k` → sliding
    * window min `w` → distinct fingerprint table
    * `f(doc_id, source, fh, fi)`. Mirrors
    * [[graft.curation.Curation.winnowFingerprints]] (k=5, w=4). */
  private val winnowCteSql =
    """WITH l AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t
      |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |e AS (
      |  SELECT doc_id, source, t, unnest(range(1, len(t) - 3)) AS i
      |  FROM l),
      |g AS (
      |  SELECT doc_id, source, CAST(i AS BIGINT) AS i,
      |    md5(array_to_string(t[CAST(i AS INT):CAST(i AS INT) + 4], ' '))
      |      AS h
      |  FROM e),
      |k AS (
      |  SELECT doc_id, source, i,
      |    h || lpad(CAST(1000000000 - i AS VARCHAR), 10, '0') AS key
      |  FROM g),
      |w AS (
      |  SELECT doc_id, source, i,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wkey
      |  FROM k),
      |f AS (
      |  SELECT DISTINCT doc_id, source, substr(wkey, 1, 32) AS fh,
      |    1000000000 - CAST(substr(wkey, 33, 10) AS BIGINT) AS fi
      |  FROM w WHERE i >= 4)""".stripMargin

  val q164 = QueryDef(
    "q164_winnow_fingerprints",
    winnowCteSql + """,
      |sh AS (
      |  SELECT fh FROM f GROUP BY fh
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |gs AS (
      |  -- gram volume is row-local (len - 4 per doc): the census never
      |  -- consumes the exploded stream
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(t) - 4) AS BIGINT) AS n_grams
      |  FROM l GROUP BY source),
      |fs AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp
      |  FROM f GROUP BY source),
      |ss AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shared_fp
      |  FROM f JOIN sh USING (fh) GROUP BY source)
      |SELECT gs.source, n_docs, n_grams,
      |  CAST(COALESCE(n_fp, 0) AS BIGINT) AS n_fp,
      |  CAST(COALESCE(n_fp, 0) * 1000000 // n_grams AS BIGINT)
      |    AS density_ppm,
      |  CAST(COALESCE(n_shared_fp, 0) AS BIGINT) AS n_shared_fp
      |-- LEFT joins: a source whose docs all bear 5-7 tokens has grams
      |-- but zero fingerprints (i >= w) and must still appear, n_fp 0
      |FROM gs LEFT JOIN fs USING (source) LEFT JOIN ss USING (source)
      |ORDER BY source""".stripMargin) { (s, d) =>
    val t = split(col("text"), " ")
    // gram volume is row-local (len − 4 per doc): the per-source census
    // reads the doc table, never the exploded stream — the stream has
    // exactly one consumer (the window) and needs no persist
    val gs = Tables.documents(s, d)
      .filter(size(t) >= 5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(t) - 4).cast("long").as("n_grams"))
    // fingerprints feed three consumers → persist
    val f = graft.curation.Curation
      .winnowFingerprints(Tables.documents(s, d), k = 5, w = 4)
      .drop("fi")
      .persist()
    val sh = f.groupBy(col("fh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("fh"))
    val fs = f.groupBy(col("source")).agg(count(lit(1)).as("n_fp"))
    val ss = f.join(sh, Seq("fh"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_shared_fp"))
    // LEFT joins: a source whose docs all bear 5-7 tokens has grams
    // but zero fingerprints (the i >= w cut) and must still appear in
    // the census with n_fp = 0 (round-6 ADVICE)
    gs.join(fs, Seq("source"), "left_outer")
      .join(ss, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        expr("coalesce(n_fp, 0L) * 1000000L div n_grams")
          .as("density_ppm"),
        coalesce(col("n_shared_fp"), lit(0L)).as("n_shared_fp"))
      .orderBy("source")
  }

  /** q165 — boilerplate segment removal (the CCNet/RefinedWeb
    * paragraph-dedup step, Wenzek et al. 2019 §4.1: hash every
    * paragraph, drop paragraphs repeated across documents — headers,
    * footers, nav chrome — while KEEPING the rest of the document;
    * the surgical complement to q22's whole-doc dedup and q137's
    * span cut): segments are non-overlapping 10-token windows (this
    * corpus has no newlines — the segmenter is the paragraph-boundary
    * stand-in, same plan shape), a segment is boilerplate when its
    * hash appears in ≥ 2 DISTINCT documents, and the report is the
    * per-source retention a curation run reads before enabling the
    * pass: segment/token volumes, removed mass, retention ppm.
    *
    * Scale: segmentation is row-local (one slice expression per doc —
    * the corpus is never exploded into tokens, only into ~n/10
    * segments); the census is one keyed agg on the 32-byte hash; the
    * mark-back is one equi-join. Identical 100-TB shape to exact
    * dedup, with the hash space ~10× the doc count. */
  val q165 = QueryDef(
    "q165_boilerplate_removal",
    """WITH l AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
      |e AS (
      |  SELECT doc_id, source, t, n,
      |    unnest(range(0, (n + 9) // 10)) AS j
      |  FROM l),
      |s AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(
      |      t[CAST(j * 10 + 1 AS INT):CAST(j * 10 + 10 AS INT)], ' '))
      |      AS h,
      |    LEAST(10, n - j * 10) AS seg_len
      |  FROM e),
      |b AS (
      |  SELECT h FROM s GROUP BY h
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |m AS (
      |  SELECT s.doc_id, s.source, s.seg_len,
      |    CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS rem
      |  FROM s LEFT JOIN b ON s.h = b.h)
      |SELECT source,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_segments,
      |  CAST(SUM(rem) AS BIGINT) AS n_boiler_segments,
      |  CAST(SUM(seg_len) AS BIGINT) AS tokens_total,
      |  CAST(SUM(rem * seg_len) AS BIGINT) AS tokens_removed,
      |  CAST((SUM(seg_len) - SUM(rem * seg_len)) * 1000000
      |    // SUM(seg_len) AS BIGINT) AS retention_ppm
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    graft.curation.Curation
      .boilerplateSegments(Tables.documents(s, d), width = 10,
        minDocs = 2)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_segments"),
        sum(col("rem")).as("n_boiler_segments"),
        sum(col("seg_len")).as("tokens_total"),
        sum(col("rem") * col("seg_len")).as("tokens_removed"))
      .select(col("source"), col("n_docs"), col("n_segments"),
        col("n_boiler_segments"), col("tokens_total"),
        col("tokens_removed"),
        expr("(tokens_total - tokens_removed) * 1000000L" +
          " div tokens_total").as("retention_ppm"))
      .orderBy("source")
  }

  /** q169 — incoming-batch overlap check against a fingerprint index
    * (the MOSS serving shape, and the crawl-ops question behind it:
    * "how much of this new batch is already in the corpus?"): the
    * stored index is the winnow fingerprint set of the existing corpus
    * (doc_id % 10 ≠ 0), the incoming batch (doc_id % 10 = 0 — the q156
    * slice convention) is fingerprinted the same way, and an incoming
    * doc matches when it shares fingerprints with the index — flagged
    * at ≥ 2 shared (one shared hash can be a single common 5-gram;
    * two selected ones indicate a ≥ 8-token overlap elsewhere too).
    * Winnowing's guarantee makes the NEGATIVE direction strong: an
    * incoming doc sharing NO fingerprint shares no 8-token substring
    * with any indexed doc.
    *
    * Scale: the index is |corpus|·density rows of 32-byte hashes —
    * the thing a crawl pipeline materializes once and equi-joins
    * every batch against; the probe is one hash join + one keyed agg,
    * incremental by construction (the q107 pattern on fingerprints). */
  val q169 = QueryDef(
    "q169_fingerprint_index",
    winnowCteSql + """,
      |idx AS (SELECT DISTINCT fh FROM f WHERE doc_id % 10 <> 0),
      |inc AS (SELECT doc_id, source, fh FROM f WHERE doc_id % 10 = 0),
      |m AS (
      |  SELECT i.doc_id, i.source, COUNT(DISTINCT i.fh) AS shared
      |  FROM inc i JOIN idx USING (fh) GROUP BY 1, 2),
      |base AS (
      |  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
      |    AS n_incoming
      |  FROM inc GROUP BY 1),
      |ms AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_matched,
      |    CAST(SUM(CASE WHEN shared >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_flagged,
      |    CAST(SUM(shared) AS BIGINT) AS total_shared
      |  FROM m GROUP BY 1)
      |SELECT base.source, n_incoming,
      |  CAST(COALESCE(n_matched, 0) AS BIGINT) AS n_matched,
      |  CAST(COALESCE(n_flagged, 0) AS BIGINT) AS n_flagged,
      |  CAST(COALESCE(total_shared, 0) AS BIGINT) AS total_shared
      |FROM base LEFT JOIN ms USING (source)
      |ORDER BY source""".stripMargin) { (s, d) =>
    // one fingerprint pass over the whole corpus, split AFTER (persist:
    // the index and probe sides are two consumers of the same frame)
    val fp = graft.curation.Curation
      .winnowFingerprints(Tables.documents(s, d), k = 5, w = 4)
      .persist()
    val idx = fp.filter(col("doc_id") % 10 =!= 0)
      .select(col("fh")).distinct()
    val inc = fp.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("source"), col("fh"))
    val m = inc.join(idx, Seq("fh"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("fh")).as("shared"))
    val base = inc.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_incoming"))
    val ms = m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("shared") >= 2, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("shared")).as("total_shared"))
    base.join(ms, Seq("source"), "left_outer")
      .select(col("source"), col("n_incoming"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("total_shared"), lit(0L)).as("total_shared"))
      .orderBy("source")
  }

  /** q172 — EXACT substring deduplication census via distributed
    * suffix-prefix ranks ([[graft.functions.SuffixRanks]], prefix
    * doubling): for every full 64-char window position in the corpus,
    * decide whether that exact 64-gram occurs anywhere else (any doc,
    * any offset), and report the per-source duplication density. This
    * is the true suffix-array dedup of Lee et al. that q104/q137's
    * bounded spans approximate: the rank table makes "same 64-prefix"
    * a GROUP-BY key, so the census is one keyed aggregation — no
    * gram-string shuffle (the packed longs shuffled per round are 8
    * bytes vs 64-byte grams), no all-pairs anything.
    *
    * The oracle materializes every 64-gram string and groups on it —
    * correct and simple for an independent engine, but the very shape
    * (shuffling |corpus|·64 bytes of gram text) that the rank table
    * exists to avoid at 100 TB. A radix-packed base step plus three
    * doubling rounds, each one keyed join + one keyed window relabel;
    * lineage stays one round deep (eager per-round checkpoints).
    *
    * Positions are BYTE offsets (SuffixRanks runs on the UTF-8
    * encoding), so the full-window filter below uses the byte length
    * — `length(encode(text))` — to match. The char-based oracle is
    * equivalent only on ASCII corpora (true of the test tables); a
    * multibyte corpus dedups byte 64-grams, a well-defined but
    * different unit. */
  val q172 = QueryDef(
    "q172_suffix_dedup",
    """WITH d AS (
      |  SELECT doc_id, source, text, length(text) AS len FROM documents),
      |e AS (
      |  SELECT doc_id, source, text,
      |    unnest(range(1, len - 62)) AS i
      |  FROM d WHERE len >= 64),
      |p AS (
      |  SELECT doc_id, source, substr(text, CAST(i AS INT), 64) AS g
      |  FROM e),
      |c AS (
      |  SELECT g, COUNT(*) AS cnt FROM p GROUP BY g)
      |SELECT p.source, COUNT(*) AS n_pos64,
      |  CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_pos,
      |  CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) * 1000000
      |    // COUNT(*) AS BIGINT) AS dup_ppm
      |FROM p JOIN c USING (g)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        length(encode(col("text"), "UTF-8")).as("len"))
    // wideBase: only the FINAL level-64 rank classes matter here, so
    // the 16-byte packed base removes one full doubling round
    // (round-12 phase 3)
    val r = graft.functions.SuffixRanks.ranks(
      docs.select(col("doc_id").as("doc"), col("text")), L = 64,
      wideBase = true)
    val full = r
      .join(docs.select(col("doc_id").as("doc"), col("source"),
        col("len")), Seq("doc"))
      .filter(col("i") + 64 <= col("len"))
    // pre-aggregate to (rank, source) cells BEFORE the class-size
    // window: the window input shrinks to three long/string columns
    // of map-side-combined cells instead of the full position frame,
    // and the per-source census is a re-sum of the cells — same
    // algebra: a position in a global class of size cnt > 1 counted 1
    // per row = c_{r,source} per cell
    full.groupBy(col("r"), col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cnt", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("r"))))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_pos64"),
        sum(when(col("cnt") > 1, col("c")).otherwise(0L))
          .as("n_dup_pos"))
      .withColumn("dup_ppm", expr("n_dup_pos * 1000000 div n_pos64"))
      .orderBy("source")
  }

  /** q173 — Aho–Corasick blocklist matching
    * ([[graft.functions.AhoCorasick]]): the automaton is built ONCE
    * driver-side from the bounded pattern vocabulary, broadcast, and
    * every document is scanned in ONE pass regardless of |patterns| —
    * vs q73's per-pattern form whose cost grows with the blocklist.
    * Matching is substring-level and overlap-inclusive ("park" is
    * found inside "spark" via the fail-chain output links — both
    * patterns appear below precisely to exercise that path). The
    * oracle counts the same occurrences positionally (every i where
    * substr(text, i, len(pat)) = pat), the exact overlap-inclusive
    * semantics. Census: per (source, pattern) documents matched and
    * total occurrences. At 100 TB: pure map-side scan + one
    * map-side-combined aggregation over |sources|·|patterns| groups;
    * the AhoCorasickSpec records the measured one-pass-vs-per-pattern
    * comparison at sf0.1. */
  val q173 = QueryDef(
    "q173_aho_corasick",
    """WITH pats AS (
      |  SELECT * FROM (VALUES ('customer'), ('spark'), ('park'),
      |    ('value part'), ('data')) AS p(pattern)),
      |d AS (
      |  SELECT doc_id, source, text, length(text) AS len FROM documents),
      |e AS (
      |  SELECT doc_id, source, text, len, pattern,
      |    length(pattern) AS plen
      |  FROM d, pats WHERE len >= length(pattern)),
      |pos AS (
      |  SELECT doc_id, source, pattern, plen, text,
      |    unnest(range(1, len - plen + 2)) AS i
      |  FROM e),
      |m AS (
      |  SELECT doc_id, source, pattern FROM pos
      |  WHERE substr(text, CAST(i AS INT), CAST(plen AS INT)) = pattern)
      |SELECT source, pattern,
      |  COUNT(DISTINCT doc_id) AS docs_matched,
      |  COUNT(*) AS occurrences
      |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val pats = Seq("customer", "spark", "park", "value part", "data")
    val ac = graft.functions.AhoCorasick.build(pats)
    val bc = s.sparkContext.broadcast(ac)
    val countsUdf = udf((text: String) => bc.value.countMatches(text))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        posexplode(countsUdf(col("text"))).as(Seq("pid", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("source"),
        element_at(lit(pats.toArray), col("pid") + 1).as("pattern"),
        col("cnt"))
      .groupBy(col("source"), col("pattern"))
      .agg(countDistinct(col("doc_id")).as("docs_matched"),
        sum(col("cnt")).as("occurrences"))
      .orderBy("source", "pattern")
  }

  /** q175 — skip-gram collocation mining with PMI scoring (the
    * word2vec/SGNS training-pair extraction stage, Mikolov et al.
    * 2013, plus the classic collocation statistic): ordered token
    * pairs within a ±2 window per document, counted corpus-wide, PMI
    * on the integer milli-nat grid (the q130 portability contract):
    *
    *   pmi_milli = mnat(c_pair) + 2·mnat(N) − mnat(P) − mnat(c₁) − mnat(c₂)
    *
    * computed as the SAME sum of floor(1000·ln k) terms on both
    * engines (floors of sums never mix with sums of floors). Top 20
    * pairs with count ≥ 5, fully ordered by (pmi, pair).
    *
    * Scale shape: pair generation is the SuffixRanks shift trick —
    * the context side is the token frame re-keyed to (doc, i+1) and
    * (doc, i+2), then ONE equi-join on (doc, j) — never a per-doc
    * quadratic join+filter; unigram/pair counts are keyed censuses
    * (vocab- and vocab²-bounded); N and P ride broadcast one-row
    * frames; the final cut is a TakeOrdered top-20. */
  val q175 = QueryDef(
    "q175_skipgram_pmi",
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
      |w AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |    toks[CAST(i AS INT)] AS w
      |  FROM p),
      |pr AS (
      |  SELECT a.w AS w1, b.w AS w2
      |  FROM w a JOIN w b
      |    ON a.doc_id = b.doc_id AND b.i - a.i IN (1, 2)),
      |pc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
      |  FROM pr GROUP BY 1, 2),
      |uc AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS p)
      |SELECT w1, w2, c_pair,
      |  ${LangModel.mnatSql("c_pair")} + 2 * ${LangModel.mnatSql("n")}
      |    - ${LangModel.mnatSql("p")} - ${LangModel.mnatSql("u1.c")}
      |    - ${LangModel.mnatSql("u2.c")} AS pmi_milli
      |FROM pc JOIN uc u1 ON pc.w1 = u1.w
      |  JOIN uc u2 ON pc.w2 = u2.w CROSS JOIN tot
      |WHERE c_pair >= 5
      |ORDER BY pmi_milli DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
    import graft.functions.LangModel.mnat
    // token frame feeds THREE consumers (pair windows, unigram census,
    // token total) — eager checkpoint so the documents scan + explode
    // run once (round-12 phase 2; the q226 reused-frame discipline)
    val toks = graft.functions.Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("doc_id").as("doc"),
          posexplode(split(col("text"), " ")).as(Seq("i0", "w")))
        .select(col("doc"), (col("i0") + 1).cast("long").as("i"),
          col("w"))
        .localCheckpoint())
    // w2 at i+1/i+2 via lead() over the doc-keyed position window
    // (round-12 phase 2): positions are CONSECUTIVE integers within a
    // doc by construction (the posexplode above), so the row k ahead
    // IS position i+k and lead-past-doc-end is null → dropped — the
    // same pairs the old (doc, i±k) equi-join built, minus both of
    // the join's hash exchanges (ONE doc-keyed sort instead; the
    // SuffixRanks lead(r, k) trick).
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
    val pairs = toks
      .select(col("w").as("w1"),
        lead(col("w"), 1).over(wDoc).as("n1"),
        lead(col("w"), 2).over(wDoc).as("n2"))
      .select(col("w1"),
        explode(array(col("n1"), col("n2"))).as("w2"))
      .filter(col("w2").isNotNull)
      .persist() // feeds the pair census AND the total
    val pc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_pair"))
    val uc = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("n"))
      .crossJoin(pairs.agg(count(lit(1)).as("p")))
    pc.filter(col("c_pair") >= 5)
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c_pair"),
        (mnat(col("c_pair")) + lit(2) * mnat(col("n")) - mnat(col("p"))
          - mnat(col("c1")) - mnat(col("c2"))).as("pmi_milli"))
      .orderBy(col("pmi_milli").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** q176 — dedup threshold sensitivity sweep (the knob-tuning
    * report a curation run consults before fixing the near-dup τ):
    * every verified LSH candidate pair is scored ONCE (exact shingle
    * intersection/union counts) and then counted against five
    * Jaccard thresholds in one conditional-aggregation pass — pairs
    * kept and documents flagged per τ. Threshold comparisons are
    * pure integer (`inter·100 ≥ τ·union`), so no float-boundary
    * drift between engines. Candidates come from the q24 band
    * contract (B=4, R=4 tuned for τ≈0.8): for LOWER τ the report is
    * explicitly "among LSH candidates" — the recall caveat a real
    * run re-tunes bands for, stated rather than hidden.
    *
    * Scale: one band self-join (the bounded-candidate contract), one
    * verify join, then a 5×-explode of the PAIR frame (candidates,
    * not corpus) into two keyed censuses. */
  val q176 = QueryDef(
    "q176_dedup_thresholds",
    lshCandSql +
      s""",
      |jc AS (
      |  SELECT c.da, c.db,
      |    len(list_intersect(sa.st, sb.st)) AS inter,
      |    len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st))
      |      AS uni
      |  FROM cand c
      |  JOIN sets sa ON sa.doc_id = c.da
      |  JOIN sets sb ON sb.doc_id = c.db),
      |th AS (SELECT unnest([50, 60, 70, 80, 90]) AS threshold_pct),
      |m AS (
      |  SELECT threshold_pct, da, db FROM jc CROSS JOIN th
      |  WHERE inter * 100 >= threshold_pct * uni),
      |pairs AS (
      |  SELECT threshold_pct, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM m GROUP BY 1),
      |docs AS (
      |  SELECT threshold_pct, CAST(COUNT(*) AS BIGINT) AS n_docs_flagged
      |  FROM (SELECT threshold_pct, da AS doc FROM m
      |        UNION SELECT threshold_pct, db FROM m)
      |  GROUP BY 1)
      |SELECT th.threshold_pct AS threshold_pct,
      |  COALESCE(n_pairs, 0) AS n_pairs,
      |  COALESCE(n_docs_flagged, 0) AS n_docs_flagged
      |FROM th LEFT JOIN pairs USING (threshold_pct)
      |  LEFT JOIN docs USING (threshold_pct)
      |ORDER BY threshold_pct""".stripMargin) { (s, d) =>
    val shl = persistedShingles(s, d)
    val cand = selfBandPairs(bandTable(shl))
    val inter = size(array_intersect(col("sta"), col("stb")))
    val jc = pairSets(cand, shingleSets(shl))
      .select(col("da"), col("db"), inter.as("inter"),
        (size(col("sta")) + size(col("stb")) - inter).as("uni"))
    val m = jc
      .select(col("da"), col("db"), col("inter"), col("uni"),
        explode(lit(Array(50, 60, 70, 80, 90))).as("threshold_pct"))
      .filter(col("inter") * 100 >= col("threshold_pct") * col("uni"))
    val pairsC = m.groupBy(col("threshold_pct"))
      .agg(count(lit(1)).as("n_pairs"))
    val docsC = m.select(col("threshold_pct"), col("da").as("doc"))
      .union(m.select(col("threshold_pct"), col("db").as("doc")))
      .distinct()
      .groupBy(col("threshold_pct"))
      .agg(count(lit(1)).as("n_docs_flagged"))
    val th = s.range(5).select((col("id") * 10 + 50).cast("int")
      .as("threshold_pct"))
    th.join(pairsC, Seq("threshold_pct"), "left_outer")
      .join(docsC, Seq("threshold_pct"), "left_outer")
      .select(col("threshold_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"))
      .orderBy("threshold_pct")
  }

  /** q177 — Dirichlet-smoothed query-likelihood ranking (Zhai &
    * Lafferty 2001; [[graft.functions.Retrieval.dirichletQL]]), the
    * language-model retrieval complement to q147's BM25 over the SAME
    * query terms — a real stack ships both and picks per workload.
    * Every document scores every term (smoothing gives absent terms
    * mass — the model's point), all on the integer milli-nat grid.
    * Top 20 by (score, doc_id). Scale: |terms|-bounded broadcast
    * cross join + one term-filtered keyed agg; no window. */
  val q177 = QueryDef(
    "q177_ql_retrieval",
    graft.functions.Retrieval.dirichletQLCteSql(bmTerms) +
      """
        |SELECT doc_id, n_hit, score_milli
        |FROM ql ORDER BY score_milli DESC, doc_id LIMIT 20""".stripMargin) {
    (s, d) =>
      graft.functions.Retrieval.dirichletQL(Tables.documents(s, d), bmTerms)
        .orderBy(col("score_milli").desc, col("doc_id"))
        .limit(20)
  }

  /** q178 — duplication-length SPECTRUM from the suffix-rank levels
    * ([[graft.functions.SuffixRanks.rankLevels]]): what fraction of
    * the corpus is exactly duplicated at gram lengths 8/16/32/64 —
    * the curve a dedup run reads to pick its span length (too short
    * → everything "duplicates"; too long → real near-copies slip).
    * The four levels come FREE from ONE prefix-doubling run (the
    * loop passes through each k), so the whole spectrum costs one
    * q172 plus four keyed censuses — where the oracle's naive form
    * materializes and groups four full gram tables. */
  val q178 = QueryDef(
    "q178_dup_spectrum", {
      val ks = Seq(8, 16, 32, 64)
      val ctes = ks.map { k =>
        s"""e$k AS (
           |  SELECT text, unnest(range(1, len - ${k - 2})) AS i
           |  FROM d WHERE len >= $k),
           |p$k AS (
           |  SELECT substr(text, CAST(i AS INT), $k) AS g FROM e$k),
           |c$k AS (SELECT g, COUNT(*) AS cnt FROM p$k GROUP BY g),
           |s$k AS (
           |  SELECT $k AS k, CAST(SUM(cnt) AS BIGINT) AS n_pos,
           |    CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
           |      AS n_dup
           |  FROM c$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents),
         |$ctes
         |SELECT k, n_pos, n_dup,
         |  n_dup * 1000000 // n_pos AS dup_ppm
         |FROM (${ks.map(k => s"SELECT * FROM s$k").mkString(" UNION ALL ")})
         |ORDER BY k""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id").as("doc"), col("text"),
        length(encode(col("text"), "UTF-8")).cast("long").as("len"))
    val lenF = docs.select(col("doc"), col("len"))
    val levels = graft.functions.SuffixRanks.rankLevels(
      docs.select(col("doc"), col("text")), L = 64)
    val perLevel = levels.map { case (k, f) =>
      // class-size census as TWO hash aggregations (map-side partial
      // agg, narrow (r, cnt) rows over the exchange) instead of a
      // sort-based Window over the full position frame — same
      // algebra: n_pos = Σ cnt, n_dup = Σ_{cnt>1} cnt (a row in a
      // class of size cnt > 1 contributed 1 per row = cnt per class)
      f.join(lenF, Seq("doc"))
        .filter(col("i") + k <= col("len"))
        .groupBy(col("r")).agg(count(lit(1)).as("cnt"))
        // coalesce keeps the empty-level row at n_pos = 0, exactly
        // what count(*) over zero rows produced before this rewrite
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_pos"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
            .as("n_dup"))
        .select(lit(k).as("k"), col("n_pos"), col("n_dup"))
    }
    perLevel.reduce(_ union _)
      .withColumn("dup_ppm", expr("n_dup * 1000000 div n_pos"))
      .orderBy("k")
  }

  /** q181 — SUFFIX ARRAY construction, oracle-checked (the
    * `ordered = true` face of [[graft.functions.SuffixRanks]] that
    * q172/q178 don't exercise): dense lexicographic rank of every
    * suffix's truncated 64-prefix over a bounded corpus slice
    * (doc_id < 50 — the slice bounds the oracle's full-sort cost, the
    * engine runs the same distributed path at any size). The ordered
    * relabel keeps the rank ORDER equal to binary string order —
    * including the truncation rule (a shorter prefix sorts before its
    * extensions, the packing sentinel 0 < every real byte) — so
    * DuckDB's DENSE_RANK() OVER (ORDER BY prefix) reproduces every
    * value. This is the index form consumed by LCP/interval queries;
    * the dedup variants are its equality-only projection. */
  val q181 = QueryDef(
    "q181_suffix_array",
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS len FROM documents
      |  WHERE doc_id < 50),
      |e AS (
      |  SELECT doc_id, text, unnest(range(0, len)) AS i FROM d),
      |p AS (
      |  SELECT doc_id AS doc, CAST(i AS BIGINT) AS i,
      |    substr(text, CAST(i + 1 AS INT), 64) AS pfx
      |  FROM e)
      |SELECT doc, i,
      |  CAST(DENSE_RANK() OVER (ORDER BY pfx) AS BIGINT) AS sa_rank
      |FROM p ORDER BY doc, i""".stripMargin) { (s, d) =>
    graft.functions.SuffixRanks.ranks(
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id").as("doc"), col("text")),
      L = 64, ordered = true, wideBase = true)
      .select(col("doc"), col("i"), col("r").as("sa_rank"))
      .orderBy("doc", "i")
  }

  /** q184 — Zipf exponent census per source (the corpus-health power
    * law: natural text has token-frequency slope ≈ −1 on log-log;
    * synthetic/templated corpora deviate — a generation-artifact
    * detector): regress mnat(freq) on mnat(rank) over each source's
    * top-100 tokens with the exact-integer OLS of q183 — both
    * variables already live on the milli-nat grid, so the whole fit
    * is integer sums with one final IEEE754 ratio. Ranks are
    * (freq desc, token) row_numbers — deterministic ties — from a
    * source-keyed window over the vocab-sized count table. Scale:
    * count table ≈ |sources|·|vocab|; everything after is bounded at
    * 100 rows per source. */
  val q184 = QueryDef(
    "q184_zipf_exponent", {
      import graft.functions.LangModel.mnatSql
      s"""WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM t GROUP BY 1, 2),
        |r AS (
        |  SELECT source, f,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY f DESC, token)
        |      AS rk
        |  FROM c),
        |g AS (
        |  SELECT source, ${mnatSql("rk")} AS x, ${mnatSql("f")} AS y
        |  FROM r WHERE rk <= 100),
        |m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM g GROUP BY 1 HAVING COUNT(*) >= 2)
        |SELECT source, n,
        |  CAST(FLOOR(1000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
        |    AS BIGINT) AS zipf_milli
        |FROM m ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    val c = Tables.documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("f"))
    val g = c
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("f").desc, col("token"))))
      .filter(col("rk") <= 100)
      .select(col("source"), mnat(col("rk")).as("x"), mnat(col("f")).as("y"))
    g.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // mnat(rank) is distinct per rank, so n >= 2 ⟹ denominator > 0;
      // a one-token source would otherwise divide by zero (null on
      // Spark, a cast error in DuckDB)
      .filter(col("n") >= 2)
      .select(col("source"), col("n"),
        floor(lit(1000.0) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long").as("zipf_milli"))
      .orderBy("source")
  }

  /** q185 — duplicate-cluster SIZE distribution (the census a dedup
    * run reads to predict its row savings and to spot pathological
    * mega-clusters before the canonical-doc pass): histogram of q66's
    * verified near-dup component sizes — how many clusters of 2, of
    * 3, … — plus the docs-removable count (size − 1 per cluster,
    * summed). Rides the SAME verified-pair components as q66/q79
    * (bounded LSH candidates → min-label propagation), then two tiny
    * keyed censuses over the |clusters|-sized frame. */
  val q185 = QueryDef(
    "q185_cluster_sizes", {
      val recursive =
        lshJacCteSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
      recursive +
        """,
        |prs AS (SELECT da, db FROM jac WHERE j >= 0.8),
        |sym AS (SELECT da AS a, db AS b FROM prs
        |        UNION SELECT db, da FROM prs),
        |reach(src, node) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN sym e ON r.node = e.a),
        |comp AS (
        |  SELECT node AS doc_id, MIN(src) AS component
        |  FROM reach GROUP BY node),
        |sizes AS (
        |  SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM comp GROUP BY 1)
        |SELECT sz AS cluster_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(COUNT(*) * (sz - 1) AS BIGINT) AS docs_removable
        |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin
    }) { (s, d) =>
    graft.functions.Components
      .connectedComponents(nearDupPairs(s, d), "da", "db")
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("docs_removable",
        col("n_clusters") * (col("cluster_size") - 1))
      .orderBy("cluster_size")
  }

  /** q190 — banded SimHash near-dup SEARCH with the pigeonhole recall
    * guarantee made into an oracle check: split the 16-bit signature
    * into four 4-bit bands; Hamming distance ≤ 3 means at most 3 bits
    * differ, so at least ONE band is untouched (pigeonhole) and the
    * band self-join finds the pair. The engine reports the ≤3-radius
    * pair census from the BANDED path only; the oracle computes it
    * from the FULL pair join — equality proves the banding lost
    * nothing at radius 3, the claim that makes banded search safe to
    * deploy. Scale note: at 16 bits the 4-bit band buckets are dense
    * (the oracle-affordable demo size); production uses a 64-bit
    * simhash with 16-bit bands — the identical plan with 2⁴⁸× sparser
    * buckets. */
  val q190 = QueryDef(
    "q190_simhash_bands", {
      val vExpr = (0 until 4).map(i =>
        s"(strpos('0123456789abcdef', substr(md5(tkn), ${i + 1}, 1)) - 1) " +
          s"* ${1 << (4 * (3 - i))}").mkString(" + ")
      val sums = (0 until 16).map(p =>
        s"SUM(CASE WHEN (v >> $p) & 1 = 1 THEN 1 ELSE -1 END) AS s$p")
        .mkString(", ")
      val bits = (0 until 16).map(p =>
        s"(CASE WHEN s$p > 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tkn
        |  FROM documents),
        |v AS (SELECT doc_id, $vExpr AS v FROM tok),
        |b AS (SELECT doc_id, $sums FROM v GROUP BY doc_id),
        |sh AS (SELECT doc_id, $bits AS sim FROM b)
        |SELECT CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    val sh = Tables.documents(s, d)
      .fanoutBy(col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.GraftText.simhash16(col("t")).as("sim"))
    val bands = sh.select(col("doc_id"), col("sim"),
      explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bkey", expr("shiftright(sim, b * 4) & 15"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("x.sim").as("sa"),
        col("y.doc_id").as("db"), col("y.sim").as("sb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("hamming") <= 3)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** q192 — Pareto FRONTIER (skyline) of quality vs cost: the
    * documents no other document beats on BOTH axes (maximize
    * stopword permille — the naturalness proxy — while minimizing
    * token cost); the skyline operator relational engines lack
    * natively, as the curation shortlist "best quality at every
    * budget". Weak dominance: b dominates a iff b is ≥ on quality,
    * ≤ on cost, and strictly better on one. Quality is QUANTIZED to
    * permille, which (a) makes the group frame ≤ 1001 rows so the
    * exclusive running-min window over it is bounded by construction
    * (the allowlisted single-partition window — the DATA never sorts
    * globally, only the group census), and (b) makes dominance pure
    * integer on both engines. A doc survives iff its cost equals its
    * quality group's minimum AND beats the running minimum of every
    * strictly-better group. The oracle is the O(n²) NOT EXISTS
    * definition — shape-independent evidence the window decomposition
    * implements the textbook semantics. */
  val q192 = QueryDef(
    "q192_pareto_frontier", {
      val stop = Text.langMarkers.head._2.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks, x -> x IN ($stop))) AS BIGINT)
        |      AS ns
        |  FROM t WHERE len(toks) > 0),
        |d AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(ns * 1000 // n_tokens AS BIGINT) AS quality_permille
        |  FROM m)
        |SELECT a.doc_id, a.quality_permille, a.n_tokens
        |FROM d a WHERE NOT EXISTS (
        |  SELECT 1 FROM d b
        |  WHERE b.quality_permille >= a.quality_permille
        |    AND b.n_tokens <= a.n_tokens
        |    AND (b.quality_permille > a.quality_permille
        |         OR b.n_tokens < a.n_tokens))
        |ORDER BY a.quality_permille DESC, a.n_tokens, a.doc_id""".stripMargin
    }) { (s, d) =>
    val stop = Text.langMarkers.head._2
    val dd = Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => t.isInCollection(stop)))
          .cast("long").as("ns"))
      .withColumn("quality_permille",
        expr("ns * 1000 div n_tokens"))
    val gf = dd.groupBy(col("quality_permille"))
      .agg(min(col("n_tokens")).as("gmin"))
    // exclusive running min over the <=1001-row quality-group frame
    // (bounded by the permille quantization — allowlisted window)
    val wq = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_permille").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val m1 = gf.withColumn("m1", min(col("gmin")).over(wq))
    dd.join(m1, Seq("quality_permille"))
      .filter(col("n_tokens") === col("gmin") &&
        (col("m1").isNull || col("gmin") < col("m1")))
      .select(col("doc_id"), col("quality_permille"), col("n_tokens"))
      .orderBy(col("quality_permille").desc, col("n_tokens"), col("doc_id"))
  }

  /** q193 — reciprocal rank FUSION (Cormack et al., SIGIR 2009) of
    * three lexical rankers over the same query — BM25 (q147), the
    * Dirichlet query likelihood (q177), and raw matched-term
    * frequency: RRF(d) = Σ_lists 1/(60 + rank_d), the standard
    * score-free fusion that beats its inputs without calibration.
    * Integer port: contribution = 10⁶ div (60 + rank) — exact on both
    * engines. Each list is cut to its top 20 by a TakeOrdered LIMIT
    * and THEN ranked (a ≤20-row re-rank window, the allowlisted q151
    * shape — rank-then-filter in the oracle is the same set under the
    * deterministic total order). Top 10 fused with the list-coverage
    * count. Scale: three bounded lists, one 60-row union, one keyed
    * sum. */
  val q193 = QueryDef(
    "q193_rrf_fusion", {
      val ql = graft.functions.Retrieval.dirichletQLCteSql(bmTerms)
        .replaceFirst("^WITH ", "")
      val inList = bmTerms.map(t => s"'$t'").mkString(", ")
      graft.functions.Retrieval.bm25CteSql(bmTerms) + ",\n" + ql +
        s""",
        |tfc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf_total
        |  FROM btok WHERE token IN ($inList) GROUP BY 1),
        |r1 AS (
        |  SELECT doc_id, rk FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER
        |      (ORDER BY score_u DESC, doc_id) AS rk FROM bm)
        |  WHERE rk <= 20),
        |r2 AS (
        |  SELECT doc_id, rk FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER
        |      (ORDER BY score_milli DESC, doc_id) AS rk FROM ql)
        |  WHERE rk <= 20),
        |r3 AS (
        |  SELECT doc_id, rk FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER
        |      (ORDER BY tf_total DESC, doc_id) AS rk FROM tfc)
        |  WHERE rk <= 20),
        |f AS (
        |  SELECT doc_id,
        |    CAST(SUM(1000000 // (60 + rk)) AS BIGINT) AS rrf_u,
        |    CAST(COUNT(*) AS BIGINT) AS n_lists
        |  FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |        UNION ALL SELECT * FROM r3)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_lists, rrf_u
        |FROM f ORDER BY rrf_u DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    def top20(scored: org.apache.spark.sql.DataFrame,
              scoreCol: String): org.apache.spark.sql.DataFrame = {
      val cut = scored.orderBy(col(scoreCol).desc, col("doc_id")).limit(20)
      cut.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col(scoreCol).desc, col("doc_id"))))
        .select(col("doc_id"), col("rk"))
    }
    val r1 = top20(graft.functions.Retrieval.bm25(docs, bmTerms), "score_u")
    val r2 = top20(graft.functions.Retrieval.dirichletQL(docs, bmTerms),
      "score_milli")
    val tfc = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .filter(col("token").isin(bmTerms: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("tf_total"))
    val r3 = top20(tfc, "tf_total")
    r1.unionByName(r2).unionByName(r3)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(expr("1000000 div (60 + rk)")).as("rrf_u"))
      .select(col("doc_id"), col("n_lists"), col("rrf_u"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
      .limit(10)
  }

  /** q200 — unigram-LM (SentencePiece-style) VITERBI segmentation
    * census ([[graft.functions.Unigram]]): every [a-z]{1,24} word in
    * the corpus segmented into the globally-cheapest piece sequence
    * under a fixed integer milli-nat inventory, reported per source as
    * token/piece totals, total cost, and fertility (pieces per word,
    * milli) — directly comparable to q150's BPE fertility on the same
    * source key (the tokenizer-choice census a training pipeline runs
    * before committing a vocab). The DP is one codegen'd packed fold
    * per DISTINCT word (cost·64+pieces packing ⇒ one integer MIN is
    * lexicographic); the oracle replays the identical DP as generated
    * per-position CTEs (b1..b24). Scale: vocabulary-sized DP +
    * broadcast-literal inventory + one keyed census — token volume
    * only enters the word-count aggregation. */
  val q200 = QueryDef(
    "q200_unigram_viterbi", {
      import graft.functions.Unigram
      s"""WITH pieces(piece, cost) AS (VALUES ${Unigram.piecesValuesSql}),
        |tk0 AS MATERIALIZED (
        |  SELECT source, unnest(string_split(text, ' ')) AS w0
        |  FROM documents),
        |tw AS MATERIALIZED (
        |  SELECT source, lower(w0) AS word, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tk0
        |  WHERE regexp_full_match(lower(w0), '[a-z]{1,${Unigram.MaxWord}}')
        |  GROUP BY 1, 2),
        |vocab AS MATERIALIZED (SELECT DISTINCT word FROM tw),
        |${Unigram.dpCtesSql}
        |SELECT source,
        |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  CAST(SUM(cnt * (packed % 64)) AS BIGINT) AS n_pieces,
        |  CAST(SUM(cnt * (packed // 64)) AS BIGINT) AS cost_milli,
        |  CAST(SUM(cnt * (packed % 64)) * 1000 // SUM(cnt) AS BIGINT)
        |    AS fertility_milli
        |FROM tw JOIN fin USING (word)
        |GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.functions.Unigram
    val tw = Tables.documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("w0"))
      .select(col("source"), lower(col("w0")).as("word"))
      .filter(col("word").rlike(s"^[a-z]{1,${Unigram.MaxWord}}$$"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val costs = Unigram.segmentCosts(tw, "word")
    tw.join(costs, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * (col("packed") % 64)).as("n_pieces"),
        sum(col("cnt") * expr("packed div 64")).as("cost_milli"))
      .withColumn("fertility_milli",
        expr("n_pieces * 1000 div n_tokens"))
      .select("source", "n_tokens", "n_pieces", "cost_milli",
        "fertility_milli")
      .orderBy("source")
  }

  /** q208 — blocked fuzzy record linkage (entity resolution): re-link
    * DIRTY records to their clean source by edit distance, with
    * equi-join BLOCKING so no all-pairs comparison ever runs — the
    * Febrl/Fellegi-Sunter pipeline shape. Records are 30-char document
    * title prefixes; the dirty side plants deterministic typos (the
    * q44/q198/q204 fixture discipline — the oracle replays the
    * generating formula): every doc_id % 5 == 2 gets a '#'
    * substitution at position 5 + doc_id % 20, and the % 10 == 7
    * subset a second one at position 26 (edit distance exactly 1 and
    * 2). Blocking key = first 4 chars (provably mutation-invariant:
    * substitutions start at position >= 5); candidates =
    * dirty ⋈ clean on the block (HASH join — the key is a
    * precomputed column, never a substring predicate), filtered to
    * levenshtein <= 2, best match per dirty record by (distance,
    * doc_id). Output: match, distance, whether it re-linked to the
    * true source, and block candidate count.
    *
    * Scale: one equi-join keyed on the block prefix; per-block work
    * is |block|² edit distances on 30-char strings — block-size skew
    * is the classic ER knob (lengthen the key / add a second pass to
    * split hot blocks); the match window partitions by dirty_id and
    * is bounded by the block size. Never O(N²) corpus-wide. */
  val q208 = QueryDef(
    "q208_record_linkage",
    """WITH c AS (
      |  SELECT doc_id, substr(text, 1, 30) AS title,
      |    substr(text, 1, 4) AS blk
      |  FROM documents),
      |d1 AS (
      |  SELECT doc_id AS dirty_id,
      |    substr(title, 1, CAST(4 + doc_id % 20 AS INT)) || '#' ||
      |      substr(title, CAST(6 + doc_id % 20 AS INT)) AS dt
      |  FROM c WHERE doc_id % 5 = 2),
      |d2 AS (
      |  SELECT dirty_id,
      |    CASE WHEN dirty_id % 10 = 7
      |      THEN substr(dt, 1, 25) || '#' || substr(dt, 27)
      |      ELSE dt END AS dt
      |  FROM d1),
      |dd AS (SELECT dirty_id, dt, substr(dt, 1, 4) AS blk FROM d2),
      |cand AS (
      |  SELECT dd.dirty_id, dd.dt, c.doc_id, c.title,
      |    CAST(levenshtein(dd.dt, c.title) AS BIGINT) AS dist,
      |    CAST(COUNT(*) OVER (PARTITION BY dd.dirty_id) AS BIGINT)
      |      AS n_cand
      |  FROM dd JOIN c ON dd.blk = c.blk),
      |m AS (
      |  SELECT dirty_id, doc_id AS matched_id, dist, n_cand,
      |    ROW_NUMBER() OVER (PARTITION BY dirty_id
      |      ORDER BY dist, doc_id) AS rn
      |  FROM cand WHERE dist <= 2)
      |SELECT dirty_id, matched_id, dist,
      |  CASE WHEN matched_id = dirty_id THEN 1 ELSE 0 END AS is_self,
      |  n_cand
      |FROM m WHERE rn = 1 ORDER BY dirty_id""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d).select(col("doc_id"),
      substring(col("text"), 1, 30).as("title"),
      substring(col("text"), 1, 4).as("blk"))
    val d1 = c.filter(col("doc_id") % 5 === 2)
      .select(col("doc_id").as("dirty_id"),
        concat(
          expr("substring(title, 1, cast(4 + doc_id % 20 as int))"),
          lit("#"),
          expr("substring(title, cast(6 + doc_id % 20 as int))")).as("dt"))
    val dd = d1
      .withColumn("dt", when(col("dirty_id") % 10 === 7,
        concat(expr("substring(dt, 1, 25)"), lit("#"),
          expr("substring(dt, 27)"))).otherwise(col("dt")))
      .withColumn("blk", substring(col("dt"), 1, 4))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("dirty_id"))
    val cand = dd.join(c, Seq("blk"))
      .select(col("dirty_id"), col("doc_id"),
        levenshtein(col("dt"), col("title")).cast("long").as("dist"))
      .withColumn("n_cand", count(lit(1)).over(wc))
    val wm = org.apache.spark.sql.expressions.Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("doc_id"))
    cand.filter(col("dist") <= 2)
      .withColumn("rn", row_number().over(wm))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("doc_id").as("matched_id"),
        col("dist"),
        when(col("doc_id") === col("dirty_id"), 1L).otherwise(0L)
          .as("is_self"),
        col("n_cand"))
      .orderBy(col("dirty_id"))
  }

  /** q232 — TextRank keyword extraction (Mihalcea & Tarau 2004):
    * corpus keywords as the PageRank of the word-adjacency graph —
    * where q175 scores PAIRS by PMI, TextRank scores WORDS by graph
    * centrality, surfacing terms that sit in many well-connected
    * contexts. Graph: adjacent-token pairs (the q175 shift-join,
    * window 1), both endpoints length ≥ 4 (the deterministic
    * stand-in for TextRank's POS filter), symmetrized and dedup'd —
    * which also satisfies [[graft.functions.PageRank]]'s no-dangling
    * precondition. 2 fixed iterations, damping 0.85, ranks snapped
    * to integer pico-units per contribution (the q82 bit-exactness
    * contract — the oracle replays the identical CTE chain over the
    * word graph). Top-25 by (rank_nano desc, word).
    *
    * Scale: token shift-join + keyed distinct build the graph in two
    * shuffles; PageRank is one keyed agg + one keyed join per round;
    * vocabulary (not corpus) sizes every frame after the first agg. */
  val q232 = QueryDef(
    "q232_textrank_keywords",
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
      |  FROM t),
      |w AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |    toks[CAST(i AS INT)] AS w
      |  FROM p),
      |bi AS (
      |  SELECT a.w AS w1, b.w AS w2
      |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  WHERE len(a.w) >= 4 AND len(b.w) >= 4 AND a.w <> b.w),
      |e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT w1 AS src, w2 AS dst FROM bi
      |    UNION ALL SELECT w2 AS src, w1 AS dst FROM bi)),
      |n AS (SELECT COUNT(DISTINCT src) AS cnt FROM e),
      |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
      |r0 AS (SELECT src AS node, 1.0 / (SELECT cnt FROM n) AS r
      |  FROM deg),
      |c1 AS (
      |  SELECT e.dst AS node,
      |    SUM(CAST(FLOOR(r0.r / deg.d * 1e12 + 0.5) AS BIGINT)) AS s
      |  FROM e JOIN r0 ON e.src = r0.node JOIN deg ON deg.src = e.src
      |  GROUP BY e.dst),
      |r1 AS (
      |  SELECT r0.node,
      |    0.15 / (SELECT cnt FROM n) + 0.85 * (COALESCE(c1.s, 0) / 1e12)
      |      AS r
      |  FROM r0 LEFT JOIN c1 ON r0.node = c1.node),
      |c2 AS (
      |  SELECT e.dst AS node,
      |    SUM(CAST(FLOOR(r1.r / deg.d * 1e12 + 0.5) AS BIGINT)) AS s
      |  FROM e JOIN r1 ON e.src = r1.node JOIN deg ON deg.src = e.src
      |  GROUP BY e.dst),
      |r2 AS (
      |  SELECT r1.node,
      |    0.15 / (SELECT cnt FROM n) + 0.85 * (COALESCE(c2.s, 0) / 1e12)
      |      AS r
      |  FROM r1 LEFT JOIN c2 ON r1.node = c2.node)
      |SELECT node AS word,
      |  CAST(FLOOR(r * 1e9 + 0.5) AS BIGINT) AS rank_nano
      |FROM r2 ORDER BY rank_nano DESC, word LIMIT 25""".stripMargin) {
    (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id").as("doc"),
        posexplode(split(col("text"), " ")).as(Seq("i0", "w")))
      .select(col("doc"), (col("i0") + 1).cast("long").as("i"),
        col("w"))
    val ctx = toks.select(col("doc"), (col("i") - 1).as("i"),
      col("w").as("w2"))
    val bi = toks.withColumnRenamed("w", "w1")
      .join(ctx, Seq("doc", "i"))
      .filter(length(col("w1")) >= 4 && length(col("w2")) >= 4 &&
        col("w1") =!= col("w2"))
      .select(col("w1"), col("w2"))
    val e = bi.select(col("w1").as("src"), col("w2").as("dst"))
      .unionByName(bi.select(col("w2").as("src"), col("w1").as("dst")))
      .distinct()
    graft.functions.PageRank.run(e, "src", "dst", iterations = 2,
        damping = 0.85, teleport = 0.15)
      .select(col("node").as("word"),
        floor(col("r") * lit(1e9) + lit(0.5)).cast("long")
          .as("rank_nano"))
      .orderBy(col("rank_nano").desc, col("word"))
      .limit(25)
  }

  /** q238 — quantile normalization across sources (the microarray /
    * cross-source feature-alignment classic, Bolstad et al. 2003):
    * replace each document's length with the POOLED length at the
    * same within-source relative rank, so every source's length
    * distribution becomes (a grid sample of) the pooled reference —
    * the preprocessing a mixing pipeline (q102/q149) applies when
    * per-source measurement scales differ but shapes should agree.
    * Within-source ranks are per-source windows; the pooled order
    * statistic is the DISTRIBUTED [[graft.functions.Ranks
    * .rowNumberGlobal]] (never a partition-less window); the map is
    * rank r of n_s → pooled position ⌈r·N/n_s⌉ = (r·N + n_s − 1)
    * div n_s, one equi-join on the position. All integers. Census
    * per source: mean length before/after and the largest per-doc
    * shift — after-means agree across sources up to grid sampling,
    * the property the operator exists for.
    *
    * Scale: one global rank (the Ranks bucket pipeline), one
    * source-partitioned window, one keyed join on pooled position;
    * everything else is keyed aggs. */
  val q238 = QueryDef(
    "q238_quantile_normalization",
    """WITH d AS (
      |  SELECT source, doc_id, n_chars AS v FROM documents),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d),
      |sr AS (
      |  SELECT source, doc_id, v,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY v, doc_id) AS BIGINT) AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
      |  FROM d),
      |pooled AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY v, doc_id) AS BIGINT)
      |    AS g, v AS pv
      |  FROM d),
      |mapped AS (
      |  SELECT sr.source, sr.v, pooled.pv
      |  FROM sr CROSS JOIN t
      |  JOIN pooled ON pooled.g = (sr.r * t.nn + sr.ns - 1) // sr.ns)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean_before,
      |  CAST(SUM(pv) // COUNT(*) AS BIGINT) AS mean_after,
      |  CAST(MAX(ABS(v - pv)) AS BIGINT) AS max_shift
      |FROM mapped GROUP BY source ORDER BY source""".stripMargin) {
    (s, d) =>
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").as("v"))
    val t = docs.agg(count(lit(1)).as("nn"))
    val wS = W.partitionBy(col("source")).orderBy(col("v"),
      col("doc_id"))
    val sr = docs
      .withColumn("r", row_number().over(wS).cast("long"))
      .withColumn("ns",
        count(lit(1)).over(W.partitionBy(col("source"))))
    val pooled = graft.functions.Ranks.rowNumberGlobal(
        docs.select(col("v"), col("doc_id")), col("v"), col("doc_id"),
        "g")
      .select(col("g"), col("v").as("pv"))
    sr.crossJoin(broadcast(t))
      .withColumn("g", expr("(r * nn + ns - 1) div ns"))
      .join(pooled, Seq("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(v) div count(1)").as("mean_before"),
        expr("sum(pv) div count(1)").as("mean_after"),
        max(abs(col("v") - col("pv"))).as("max_shift"))
      .orderBy(col("source"))
  }

  /** q249 — Heaps' law fit: vocabulary growth V(n) ≈ K·n^β measured
    * on the corpus itself — the sublinearity constant that sizes
    * every vocabulary-bounded structure in this engine (the q116/
    * q120 coverage tables, q129's merge table, q235's hash widths)
    * as the corpus grows 1000×. Checkpoints are document-count
    * prefixes in doc_id order over 3-GRAM types (the synthetic corpus'
    * 31-WORD vocabulary saturates by doc 10 — measured — while the
    * trigram space keeps growing); a type "appears" at the MIN
    * doc_id containing it (one keyed agg — never a per-prefix
    * rescan), so V at each checkpoint is a census filter. β comes from the q220 exact-integer
    * OLS on the mnat grid over (ln n_tokens, ln V) at the
    * checkpoints; β < 1 is the sublinearity claim, printed not
    * assumed.
    *
    * Scale: two keyed censuses (first-appearance, per-doc token
    * counts) + a checkpoint-ladder join (≤10 rows); the OLS is a
    * 10-row fold. */
  val q249 = QueryDef(
    "q249_heaps_law",
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
      |  FROM t),
      |w AS (
      |  SELECT doc_id, toks[CAST(i AS INT)] || '_'
      |    || toks[CAST(i + 1 AS INT)] || '_'
      |    || toks[CAST(i + 2 AS INT)] AS w
      |  FROM p),
      |fa AS (SELECT w, CAST(MIN(doc_id) AS BIGINT) AS fd FROM w
      |  GROUP BY 1),
      |dt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM w
      |  GROUP BY 1),
      |ck AS (
      |  SELECT CAST(unnest([10, 20, 50, 100, 150, 200, 300, 400, 500])
      |    AS BIGINT) AS cap),
      |pts AS (
      |  SELECT ck.cap,
      |    (SELECT CAST(SUM(nt) AS BIGINT) FROM dt
      |     WHERE doc_id < ck.cap) AS n_tokens,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM fa
      |     WHERE fd < ck.cap) AS v
      |  FROM ck),
      |xy AS (
      |  SELECT cap, n_tokens, v,
      |    ${graft.functions.LangModel.mnatSql("n_tokens")} AS x,
      |    ${graft.functions.LangModel.mnatSql("v")} AS y
      |  FROM pts WHERE n_tokens > 0 AND v > 0),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM xy)
      |SELECT n AS n_checkpoints,
      |  CAST(FLOOR(1000.0 * (n * sxy - sx * sy)
      |    / (n * sxx - sx * sx)) AS BIGINT) AS beta_milli,
      |  CAST(CASE WHEN 1000.0 * (n * sxy - sx * sy)
      |    / (n * sxx - sx * sx) < 1000 THEN 1 ELSE 0 END AS BIGINT)
      |    AS sublinear
      |FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0""".stripMargin) {
    (s, d) =>
    import graft.functions.LangModel.mnat
    val w = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3)," +
          " i -> concat(toks[i], '_', toks[i+1], '_', toks[i+2]))"))
        .as("w"))
    val fa = w.groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val dt = w.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
    // checkpoint census: each doc/type row explodes into the ≤9 caps
    // it falls under, then two keyed aggs — never a per-prefix
    // rescan of the corpus (the q235 literal-ladder pattern)
    val caps = array(Seq(10L, 20L, 50L, 100L, 150L, 200L, 300L, 400L,
      500L).map(lit): _*)
    val nTok = dt.withColumn("cap", explode(caps))
      .filter(col("doc_id") < col("cap"))
      .groupBy(col("cap")).agg(sum(col("nt")).as("n_tokens"))
    val vAt = fa.withColumn("cap", explode(caps))
      .filter(col("fd") < col("cap"))
      .groupBy(col("cap")).agg(count(lit(1)).as("v"))
    val xy = nTok.join(vAt, Seq("cap"))
      .filter(col("n_tokens") > 0 && col("v") > 0)
      .select(mnat(col("n_tokens")).as("x"), mnat(col("v")).as("y"))
    val m = xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    m.filter(col("n") >= 2 &&
        col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(col("n").as("n_checkpoints"),
        floor(lit(1000.0) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long").as("beta_milli"),
        (lit(1000.0) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) < 1000.0)
          .cast("long").as("sublinear"))
  }

  /** Shared FS-linkage candidate frame (q266 supervised weights, q311
    * EM training): the q208 planted-typo fixture reduced to its
    * 4-field agreement pattern per block-join candidate —
    * (dirty_id, doc_id, a1 fuzzy-title, a2 lang, a3 source,
    * a4 n_chars-century, mt planted truth). `mt` is EVALUATION-ONLY
    * for q311 (EM never reads it). */
  private[queries] val fsCandSql =
    """c AS (
      |  SELECT doc_id, substr(text, 1, 30) AS title,
      |    substr(text, 1, 4) AS blk, lang, source,
      |    n_chars // 100 AS ncb
      |  FROM documents),
      |d1 AS (
      |  SELECT doc_id AS dirty_id,
      |    substr(title, 1, CAST(4 + doc_id % 20 AS INT)) || '#' ||
      |      substr(title, CAST(6 + doc_id % 20 AS INT)) AS dt,
      |    lang AS dlang, source AS dsource, ncb AS dncb
      |  FROM c WHERE doc_id % 5 = 2),
      |dd AS (
      |  SELECT dirty_id,
      |    CASE WHEN dirty_id % 10 = 7
      |      THEN substr(dt, 1, 25) || '#' || substr(dt, 27)
      |      ELSE dt END AS dt,
      |    dlang, dsource, dncb
      |  FROM d1),
      |cand AS (
      |  SELECT dd.dirty_id, c.doc_id,
      |    CASE WHEN levenshtein(dd.dt, c.title) <= 2 THEN 1 ELSE 0 END
      |      AS a1,
      |    CASE WHEN dd.dlang = c.lang THEN 1 ELSE 0 END AS a2,
      |    CASE WHEN dd.dsource = c.source THEN 1 ELSE 0 END AS a3,
      |    CASE WHEN dd.dncb = c.ncb THEN 1 ELSE 0 END AS a4,
      |    CASE WHEN dd.dirty_id = c.doc_id THEN 1 ELSE 0 END AS mt
      |  FROM dd JOIN c ON substr(dd.dt, 1, 4) = c.blk)""".stripMargin

  private[queries] def fsCandidates(
      s: SparkSession, d: String): DataFrame = {
    val c = Tables.documents(s, d).select(col("doc_id"),
      substring(col("text"), 1, 30).as("title"),
      substring(col("text"), 1, 4).as("blk"), col("lang"),
      col("source"), expr("n_chars div 100").as("ncb"))
    val d1 = c.filter(col("doc_id") % 5 === 2)
      .select(col("doc_id").as("dirty_id"),
        concat(
          expr("substring(title, 1, cast(4 + doc_id % 20 as int))"),
          lit("#"),
          expr("substring(title, cast(6 + doc_id % 20 as int))"))
          .as("dt"),
        col("lang").as("dlang"), col("source").as("dsource"),
        col("ncb").as("dncb"))
    val dd = d1
      .withColumn("dt", when(col("dirty_id") % 10 === 7,
        concat(expr("substring(dt, 1, 25)"), lit("#"),
          expr("substring(dt, 27)"))).otherwise(col("dt")))
      .withColumn("blk", substring(col("dt"), 1, 4))
    dd.join(c, Seq("blk"))
      .select(col("dirty_id"), col("doc_id"),
        (levenshtein(col("dt"), col("title")) <= 2).cast("long")
          .as("a1"),
        (col("dlang") === col("lang")).cast("long").as("a2"),
        (col("dsource") === col("source")).cast("long").as("a3"),
        (col("dncb") === col("ncb")).cast("long").as("a4"),
        (col("dirty_id") === col("doc_id")).cast("long").as("mt"))
  }

  /** q266 — Fellegi–Sunter probabilistic linkage weights (Fellegi &
    * Sunter 1969): the DECISION layer above q208's blocked candidate
    * generation. Over the same block-join candidates (dirty title vs
    * clean record), four agreement fields — fuzzy title
    * (levenshtein ≤ 2), lang, source, n_chars century bucket — form
    * the agreement PATTERN; m_k = P(agree|match) and
    * u_k = P(agree|non-match) are exact ppm ratios against the
    * planted ground truth (true pair ⟺ matched id = dirty id — the
    * q208 fixture discipline doubling as labeled training data), and
    * each pattern's log-likelihood score is the FS sum
    * Σ agree ? ln(m/u) : ln((1−m)/(1−u)) on the milli-nat grid
    * (mnat of ppm values; ppm clamped to [1, 10⁶−1] — the standard
    * FS ε-smoothing, since the planted typos make title-m exactly 1).
    * Output: the ≤16-row pattern table with pair counts, true-match
    * counts, score, and the score ≥ 0 link decision — precision is
    * readable directly off the table.
    *
    * Scale: the candidate frame is block-bounded (q208's argument);
    * everything after is a 16-row census joined against one
    * broadcast row of global m/u weights. */
  val q266 = QueryDef(
    "q266_fellegi_sunter",
    "WITH " + fsCandSql + """,
      |mu AS (
      |  SELECT
      |    CAST(SUM(mt) AS BIGINT) AS nm,
      |    CAST(COUNT(*) - SUM(mt) AS BIGINT) AS nu,
      |    LEAST(999999, GREATEST(1,
      |      (1000000 * SUM(a1 * mt)) // SUM(mt))) AS m1,
      |    LEAST(999999, GREATEST(1, (1000000 * SUM(a1 * (1 - mt)))
      |      // (COUNT(*) - SUM(mt)))) AS u1,
      |    LEAST(999999, GREATEST(1,
      |      (1000000 * SUM(a2 * mt)) // SUM(mt))) AS m2,
      |    LEAST(999999, GREATEST(1, (1000000 * SUM(a2 * (1 - mt)))
      |      // (COUNT(*) - SUM(mt)))) AS u2,
      |    LEAST(999999, GREATEST(1,
      |      (1000000 * SUM(a3 * mt)) // SUM(mt))) AS m3,
      |    LEAST(999999, GREATEST(1, (1000000 * SUM(a3 * (1 - mt)))
      |      // (COUNT(*) - SUM(mt)))) AS u3,
      |    LEAST(999999, GREATEST(1,
      |      (1000000 * SUM(a4 * mt)) // SUM(mt))) AS m4,
      |    LEAST(999999, GREATEST(1, (1000000 * SUM(a4 * (1 - mt)))
      |      // (COUNT(*) - SUM(mt)))) AS u4
      |  FROM cand),
      |pat AS (
      |  SELECT a1, a2, a3, a4,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(mt) AS BIGINT) AS n_true
      |  FROM cand GROUP BY 1, 2, 3, 4),
      |sc AS (
      |  SELECT p.a1, p.a2, p.a3, p.a4, p.n_pairs, p.n_true,
      |    (CASE WHEN p.a1 = 1
      |       THEN CAST(FLOOR(LN(CAST(mu.m1 AS DOUBLE)) * 1000) AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(mu.u1 AS DOUBLE)) * 1000) AS BIGINT)
      |       ELSE CAST(FLOOR(LN(CAST(1000000 - mu.m1 AS DOUBLE)) * 1000)
      |           AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(1000000 - mu.u1 AS DOUBLE)) * 1000)
      |           AS BIGINT) END)
      |    + (CASE WHEN p.a2 = 1
      |       THEN CAST(FLOOR(LN(CAST(mu.m2 AS DOUBLE)) * 1000) AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(mu.u2 AS DOUBLE)) * 1000) AS BIGINT)
      |       ELSE CAST(FLOOR(LN(CAST(1000000 - mu.m2 AS DOUBLE)) * 1000)
      |           AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(1000000 - mu.u2 AS DOUBLE)) * 1000)
      |           AS BIGINT) END)
      |    + (CASE WHEN p.a3 = 1
      |       THEN CAST(FLOOR(LN(CAST(mu.m3 AS DOUBLE)) * 1000) AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(mu.u3 AS DOUBLE)) * 1000) AS BIGINT)
      |       ELSE CAST(FLOOR(LN(CAST(1000000 - mu.m3 AS DOUBLE)) * 1000)
      |           AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(1000000 - mu.u3 AS DOUBLE)) * 1000)
      |           AS BIGINT) END)
      |    + (CASE WHEN p.a4 = 1
      |       THEN CAST(FLOOR(LN(CAST(mu.m4 AS DOUBLE)) * 1000) AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(mu.u4 AS DOUBLE)) * 1000) AS BIGINT)
      |       ELSE CAST(FLOOR(LN(CAST(1000000 - mu.m4 AS DOUBLE)) * 1000)
      |           AS BIGINT)
      |          - CAST(FLOOR(LN(CAST(1000000 - mu.u4 AS DOUBLE)) * 1000)
      |           AS BIGINT) END) AS score_mnat
      |  FROM pat p CROSS JOIN mu)
      |SELECT CAST(a1 AS BIGINT) AS a_title, CAST(a2 AS BIGINT) AS a_lang,
      |  CAST(a3 AS BIGINT) AS a_source, CAST(a4 AS BIGINT) AS a_ncb,
      |  n_pairs, n_true, score_mnat,
      |  CAST(CASE WHEN score_mnat >= 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS link
      |FROM sc ORDER BY a_title, a_lang, a_source, a_ncb""".stripMargin) {
    (s, d) =>
    import graft.functions.LangModel.mnat
    val cand = fsCandidates(s, d)
    def muCols: Seq[Column] = (1 to 4).flatMap { k =>
      val a = col(s"a$k")
      Seq(
        least(lit(999999L), greatest(lit(1L),
          expr(s"(1000000L * sum(a$k * mt)) div sum(mt)"))).as(s"m$k"),
        least(lit(999999L), greatest(lit(1L),
          expr(s"(1000000L * sum(a$k * (1 - mt)))" +
            " div (count(1) - sum(mt))"))).as(s"u$k"))
    }
    val mu = cand.agg(muCols.head, muCols.tail: _*)
    val pat = cand.groupBy(col("a1"), col("a2"), col("a3"), col("a4"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("mt")).as("n_true"))
    def term(k: Int): Column =
      when(col(s"a$k") === 1,
        mnat(col(s"m$k")) - mnat(col(s"u$k")))
        .otherwise(mnat(lit(1000000L) - col(s"m$k"))
          - mnat(lit(1000000L) - col(s"u$k")))
    pat.crossJoin(broadcast(mu))
      .withColumn("score_mnat",
        term(1) + term(2) + term(3) + term(4))
      .select(col("a1").as("a_title"), col("a2").as("a_lang"),
        col("a3").as("a_source"), col("a4").as("a_ncb"),
        col("n_pairs"), col("n_true"), col("score_mnat"),
        (col("score_mnat") >= 0).cast("long").as("link"))
      .orderBy(col("a_title"), col("a_lang"), col("a_source"),
        col("a_ncb"))
  }

  /** q269 — Flesch–Kincaid readability census (Kincaid et al. 1975):
    * the grade-level score every text-quality pipeline reports next
    * to the q29/q85 structural gates. Per document, all three inputs
    * are exact integer counts — words = letter runs, sentences =
    * 1 + terminal-punctuation runs, syllables = vowel GROUPS (the
    * standard heuristic; counting runs over the whole lowercased
    * text equals the per-word sum because words never span
    * non-letters) — and the grade 0.39·W/S + 11.8·Y/W − 15.59 snaps
    * each rational term separately: (390·W)÷S + (11800·Y)÷W − 15590
    * in exact milli (floor-div of non-negative integers, no float
    * anywhere). Census per source: mean/min/max grade and the
    * college-level share (> 13.0) in exact ppm.
    *
    * Scale: one regexp-count projection (codegen'd, no explode — the
    * token arrays never materialize) + one keyed census. */
  val q269 = QueryDef(
    "q269_readability",
    """WITH g AS (
      |  SELECT source,
      |    len(regexp_extract_all(lower(text), '[a-z]+')) AS w,
      |    1 + len(regexp_extract_all(text, '[.!?]+')) AS sen,
      |    len(regexp_extract_all(lower(text), '[aeiou]+')) AS y
      |  FROM documents),
      |sc AS (
      |  SELECT source,
      |    (390 * w) // sen + (11800 * y) // w - 15590 AS grade
      |  FROM g WHERE w > 0)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST((SUM(grade) + COUNT(*) * 1000000000) // COUNT(*)
      |    - 1000000000 AS BIGINT) AS mean_grade_milli,
      |  CAST(MIN(grade) AS BIGINT) AS min_grade_milli,
      |  CAST(MAX(grade) AS BIGINT) AS max_grade_milli,
      |  CAST((1000000 * SUM(CASE WHEN grade > 13000 THEN 1 ELSE 0 END))
      |    // COUNT(*) AS BIGINT) AS college_ppm
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val g = Tables.documents(s, d).select(col("source"),
      size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .cast("long").as("w"),
      (lit(1L) + size(expr("regexp_extract_all(text, '[.!?]+', 0)")))
        .as("sen"),
      size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
        .cast("long").as("y"))
    g.filter(col("w") > 0)
      .select(col("source"),
        (expr("(390L * w) div sen") + expr("(11800L * y) div w")
          - lit(15590L)).as("grade"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("""(sum(grade) + count(1) * 1000000000L)
          | div count(1) - 1000000000L""".stripMargin)
          .as("mean_grade_milli"),
        min(col("grade")).as("min_grade_milli"),
        max(col("grade")).as("max_grade_milli"),
        expr("""(1000000L * sum(case when grade > 13000 then 1
          | else 0 end)) div count(1)""".stripMargin)
          .as("college_ppm"))
      .orderBy(col("source"))
  }

  /** q273 — Good–Turing frequency smoothing (Good 1953): the
    * frequency-of-frequencies table N_c and the discounted counts
    * c* = (c+1)·N_{c+1}/N_c that re-estimate how much probability
    * mass the corpus's RARE words actually deserve — the third
    * smoothing estimator beside q130's add-one and q211's
    * Kneser–Ney, and the one whose TRAINING is pure count arithmetic
    * end to end. c* on the milli grid as an exact integer ratio of
    * two counts; the unseen-mass estimate P₀ = N₁/N in exact ppm is
    * the number a decontamination/coverage pipeline (q86/q116)
    * quotes. Rows for c = 1..10 plus the c ≥ 11 tail census.
    *
    * Scale: token census → count census (vocabulary- then
    * COUNT-DOMAIN-bounded — the frequency-of-frequencies frame has
    * ≤ max-count rows no matter the corpus); the adjacent-count
    * join is on the tiny census frame. */
  val q273 = QueryDef(
    "q273_good_turing",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, toks,
      |    unnest(range(1, len(toks) - 1)) AS i
      |  FROM t),
      |tok AS (
      |  SELECT toks[CAST(i AS INT)] || ' ' ||
      |    toks[CAST(i + 1 AS INT)] || ' ' ||
      |    toks[CAST(i + 2 AS INT)] AS w
      |  FROM p),
      |tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
      |  GROUP BY 1),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
      |ff AS (
      |  SELECT LEAST(c, 11) AS c, CAST(COUNT(*) AS BIGINT) AS nc,
      |    CAST(SUM(c) AS BIGINT) AS mass
      |  FROM tc GROUP BY 1)
      |SELECT f.c, f.nc AS n_types, f.mass AS token_mass,
      |  CAST(CASE WHEN f.c <= 10 AND g.nc IS NOT NULL
      |    THEN (1000 * (f.c + 1) * g.nc) // f.nc END AS BIGINT)
      |    AS c_star_milli,
      |  CAST((1000000 * f.mass) // n.n AS BIGINT) AS mass_ppm
      |FROM ff f LEFT JOIN ff g ON g.c = f.c + 1
      |CROSS JOIN n
      |ORDER BY f.c""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """transform(sequence(0, size(toks) - 3),
          | i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))"""
          .stripMargin)).as("w"))
    val tc = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = tc.agg(sum(col("c")).as("n"))
    val ff = tc.groupBy(least(col("c"), lit(11L)).as("c"))
      .agg(count(lit(1)).as("nc"), sum(col("c")).as("mass"))
    ff.join(ff.select(col("c") - 1 as "c", col("nc").as("nc1")),
        Seq("c"), "left")
      .crossJoin(broadcast(n))
      .select(col("c"), col("nc").as("n_types"),
        col("mass").as("token_mass"),
        when(col("c") <= 10 && col("nc1").isNotNull,
          expr("(1000L * (c + 1) * nc1) div nc"))
          .cast("long").as("c_star_milli"),
        expr("(1000000L * mass) div n").as("mass_ppm"))
      .orderBy(col("c"))
  }

  /** q276 — Jensen–Shannon divergence of each source's word
    * distribution from the corpus mixture (Lin 1991): the SYMMETRIC,
    * always-finite distribution distance a mixing pipeline (q102's
    * temperature weights) uses to quantify how far each source sits
    * from the blend — KL alone explodes on any word a source lacks,
    * JS never does. Per source S with corpus C:
    * JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m), m = (p+q)/2 — every
    * probability an exact ppm integer, every log a milli-nat snap
    * (mnat of ppm — the q227/q266 grid), the ½ folds into the final
    * // 2. Zero-count terms contribute exactly 0 from the side that
    * lacks them (0·ln 0 = 0), handled by the ppm≥1 guard on the
    * FULL source×vocabulary grid (a source-absent word still pays
    * its q·ln(2q/(p+q)) share), never by smoothing — this is JS's
    * point.
    *
    * Scale: one word census per (source, word) — vocabulary-bounded
    * after the first keyed agg; per-source totals broadcast back. */
  val q276 = QueryDef(
    "q276_js_divergence",
    s"""WITH tok AS (
      |  SELECT source, lower(w) AS w
      |  FROM documents, UNNEST(regexp_extract_all(lower(text),
      |    '[a-z]+')) AS t(w)),
      |sw AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sw
      |  GROUP BY 1),
      |cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cc FROM sw
      |  GROUP BY 1),
      |ct AS (SELECT CAST(SUM(c) AS BIGINT) AS cn FROM sw),
      |pq AS (
      |  SELECT st.source, cw.w,
      |    (1000000 * COALESCE(sw.c, 0)) // st.n AS p,
      |    (1000000 * cw.cc) // ct.cn AS q
      |  FROM st CROSS JOIN cw
      |  LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w
      |  CROSS JOIN ct),
      |terms AS (
      |  SELECT source,
      |    CASE WHEN p >= 1 THEN p * (${graft.functions.LangModel
            .mnatSql("2 * p")} - ${graft.functions.LangModel
            .mnatSql("p + q")}) ELSE 0 END AS tp,
      |    CASE WHEN q >= 1 THEN q * (${graft.functions.LangModel
            .mnatSql("2 * q")} - ${graft.functions.LangModel
            .mnatSql("p + q")}) ELSE 0 END AS tq
      |  FROM pq)
      |SELECT source,
      |  CAST((SUM(tp) + SUM(tq) + 4000000000000) // 2000000
      |    - 2000000 AS BIGINT) AS jsd_micronat
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.functions.LangModel.mnat
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
    val sw = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
    val st = sw.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val cw = sw.groupBy(col("w")).agg(sum(col("c")).as("cc"))
    val ct = sw.agg(sum(col("c")).as("cn"))
    val pq = st.crossJoin(broadcast(cw))
      .join(sw, Seq("source", "w"), "left")
      .crossJoin(broadcast(ct))
      .select(col("source"),
        expr("(1000000L * coalesce(c, 0L)) div n").as("p"),
        expr("(1000000L * cc) div cn").as("q"))
    pq.select(col("source"),
        when(col("p") >= 1,
          col("p") * (mnat(lit(2L) * col("p"))
            - mnat(col("p") + col("q")))).otherwise(0L).as("tp"),
        when(col("q") >= 1,
          col("q") * (mnat(lit(2L) * col("q"))
            - mnat(col("p") + col("q")))).otherwise(0L).as("tq"))
      .groupBy(col("source"))
      .agg(expr("""(sum(tp) + sum(tq) + 4000000000000L) div 2000000
        | - 2000000L""".stripMargin).as("jsd_micronat"))
      .orderBy(col("source"))
  }

  /** q282 — Dunning log-likelihood collocations (Dunning 1993): the
    * G² statistic that replaced PMI (q175) as the collocation
    * standard precisely because it doesn't over-reward rare pairs —
    * G² = 2·Σ over the 2×2 contingency of O·ln(O/E), with
    * ln(O/E) = ln(O·N) − ln(R·C) so every log argument is an exact
    * integer product and every term one milli-nat snap (the
    * q266/q276 grid); empty cells contribute exactly 0 (the O·ln O
    * limit), no smoothing. Bigrams from the q232 adjacent-token
    * shift-join; top-20 by integer-ranked G².
    *
    * Scale: one shift-join for bigram counts, two unigram-margin
    * keyed aggs broadcast back, one one-row total; the statistic is
    * a projection. Vocabulary-bounded after the first agg. */
  val q282 = QueryDef(
    "q282_dunning_collocations", {
      def t(o: String, e1: String, e2: String): String =
        s"""CASE WHEN $o >= 1 THEN ($o) * (${graft.functions.LangModel
            .mnatSql(s"($o) * nn.n")} - ${graft.functions.LangModel
            .mnatSql(s"($e1) * ($e2)")}) ELSE 0 END"""
      s"""WITH t0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |  FROM t0),
        |bi AS (
        |  SELECT toks[CAST(i AS INT)] AS w1,
        |    toks[CAST(i + 1 AS INT)] AS w2
        |  FROM p),
        |bc AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS a
        |  FROM bi GROUP BY 1, 2),
        |m1 AS (SELECT w1, CAST(SUM(a) AS BIGINT) AS r FROM bc
        |  GROUP BY 1),
        |m2 AS (SELECT w2, CAST(SUM(a) AS BIGINT) AS c FROM bc
        |  GROUP BY 1),
        |nn AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM bc),
        |g AS (
        |  SELECT bc.w1, bc.w2, bc.a, m1.r, m2.c, nn.n,
        |    2 * (${t("bc.a", "m1.r", "m2.c")}
        |      + ${t("m1.r - bc.a", "m1.r", "nn.n - m2.c")}
        |      + ${t("m2.c - bc.a", "nn.n - m1.r", "m2.c")}
        |      + ${t("nn.n - m1.r - m2.c + bc.a",
                     "nn.n - m1.r", "nn.n - m2.c")}) AS g2
        |  FROM bc JOIN m1 ON bc.w1 = m1.w1 JOIN m2 ON bc.w2 = m2.w2
        |  CROSS JOIN nn)
        |SELECT w1, w2, a AS n_pair, r AS n_left, c AS n_right,
        |  CAST(g2 AS BIGINT) AS g2_mnat
        |FROM g ORDER BY g2 DESC, w1, w2 LIMIT 20""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    val bi = Tables.documents(s, d)
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """transform(sequence(0, size(toks) - 2),
          | i -> struct(toks[i] as w1, toks[i + 1] as w2))"""
          .stripMargin)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("a"))
    val m1 = bc.groupBy(col("w1")).agg(sum(col("a")).as("r"))
    val m2 = bc.groupBy(col("w2")).agg(sum(col("a")).as("c"))
    val nn = bc.agg(sum(col("a")).as("n"))
    def term(o: Column, e1: Column, e2: Column): Column =
      when(o >= 1, o * (mnat(o * col("n")) - mnat(e1 * e2)))
        .otherwise(0L)
    bc.join(broadcast(m1), Seq("w1")).join(broadcast(m2), Seq("w2"))
      .crossJoin(broadcast(nn))
      .withColumn("g2", lit(2L)
        * (term(col("a"), col("r"), col("c"))
          + term(col("r") - col("a"), col("r"), col("n") - col("c"))
          + term(col("c") - col("a"), col("n") - col("r"), col("c"))
          + term(col("n") - col("r") - col("c") + col("a"),
              col("n") - col("r"), col("n") - col("c"))))
      .select(col("w1"), col("w2"), col("a").as("n_pair"),
        col("r").as("n_left"), col("c").as("n_right"),
        col("g2").as("g2_mnat"))
      .orderBy(col("g2_mnat").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** q296 — word adaptation / burstiness census (Church & Gale 1995;
    * Church 2000 "Empirical estimates of adaptation"): the corpus
    * statistic that kills the bag-of-independent-words assumption —
    * for each frequent word, P(k ≥ 2 | k ≥ 1) (seen once in a doc →
    * how likely AGAIN in the same doc) against the unconditional
    * prior P(k ≥ 1); natural language shows adaptation ≫ prior
    * (topical words burst). Both probabilities are exact ppm ratios
    * of document-frequency counts (df₂/df₁ and df₁/N); the boost
    * column df₂·N·10³ ÷ (df₁·df₁) says how many TIMES the prior the
    * adaptation is. Top-15 words by boost — the burstiest terms are
    * the topical signal a TF-IDF-style weighting (q77) exploits.
    *
    * Scale: one (word, doc) census with per-doc counts (map-side
    * combinable), one word census, one one-row doc count. */
  val q296 = QueryDef(
    "q296_word_adaptation",
    """WITH wd AS (
      |  SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM (SELECT doc_id, lower(w) AS w
      |        FROM documents,
      |          UNNEST(regexp_extract_all(lower(text), '[a-z]+'))
      |          AS t(w))
      |  GROUP BY 1, 2),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |wa AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS df1,
      |    CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS df2
      |  FROM wd GROUP BY 1 HAVING COUNT(*) >= 20)
      |SELECT w AS word, df1, df2,
      |  CAST((1000000 * df2) // df1 AS BIGINT) AS adaptation_ppm,
      |  CAST((1000000 * df1) // nd.n AS BIGINT) AS prior_ppm,
      |  CAST((1000 * df2 * nd.n) // (df1 * df1) AS BIGINT)
      |    AS boost_milli
      |FROM wa CROSS JOIN nd
      |ORDER BY boost_milli DESC, word LIMIT 15""".stripMargin) {
    (s, d) =>
    val wd = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("k"))
    val nd = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    wd.groupBy(col("w"))
      .agg(count(lit(1)).as("df1"),
        sum(when(col("k") >= 2, 1L).otherwise(0L)).as("df2"))
      .filter(col("df1") >= 20)
      .crossJoin(broadcast(nd))
      .select(col("w").as("word"), col("df1"), col("df2"),
        expr("(1000000L * df2) div df1").as("adaptation_ppm"),
        expr("(1000000L * df1) div n").as("prior_ppm"),
        expr("(1000L * df2 * n) div (df1 * df1)").as("boost_milli"))
      .orderBy(col("boost_milli").desc, col("word"))
      .limit(15)
  }

  /** q311 — UNSUPERVISED Fellegi–Sunter parameter training via EM
    * (Winkler 1988; the estimator inside every modern linkage engine,
    * e.g. Splink): q266 computes m/u from the planted truth — the
    * luxury a real deployment lacks. Here two unrolled EM rounds over
    * the SAME candidate frame learn λ (match prevalence), m_k, u_k
    * from the 16-row agreement-PATTERN census alone (Winkler's
    * pattern-level formulation — the E-step posterior is constant
    * within a pattern, so EM runs on |patterns| rows regardless of
    * corpus size):
    *   E: post(γ) = λ·Πm̃_k / (λ·Πm̃_k + (1−λ)·Πũ_k),
    *      m̃_k = a_k ? m_k : 10⁶−m_k (staged ppm products, floored
    *      per multiply so every intermediate stays ≤ 10⁶);
    *   M: λ, m_k, u_k ← posterior-weighted ppm ratios, clamped to
    *      [1, 999999] (the q266 ε-smoothing).
    * Init λ=0.1, m=0.9, u=0.1 (the standard Splink prior). `mt` is
    * evaluation-only: the output pattern table carries n_true beside
    * the learned posterior, so the reader sees EM rediscover the
    * supervised structure (all-agree pattern → post ≈ 10⁶, λ
    * converging to the true prevalence) without ever training on it.
    *
    * Scale: E/M are arithmetic on the broadcast 16-row pattern census
    * + a 1-row parameter frame — after the one blocked candidate agg
    * (q208's bound), EM cost is independent of corpus size. */
  val q311 = QueryDef(
    "q311_fs_em", {
      def term(k: Int, mu: String) =
        s"CASE WHEN pat.a$k = 1 THEN p.$mu$k ELSE 1000000 - p.$mu$k END"
      def prod(mu: String) = (2 to 4).foldLeft(term(1, mu))((e, k) =>
        s"(($e) * (${term(k, mu)})) // 1000000")
      // GREATEST(1, ·) on the denominator: the staged ppm products
      // floor to 0 when a parameter is driven to the 999999 clamp on a
      // disagreeing bit, and lam*prod_m + (1-lam)*prod_u = 0 would be
      // a division-by-zero ERROR in DuckDB but NULL in Spark — a
      // cross-engine behavioral split. The guard (same ε-clamp
      // discipline as the M-step) makes the degenerate posterior 0 in
      // both engines.
      def post = s"(1000000 * (p.lam * (${prod("m")}))) // " +
        s"GREATEST(1, p.lam * (${prod("m")}) + " +
        s"(1000000 - p.lam) * (${prod("u")}))"
      def clamp(e: String) =
        s"CAST(LEAST(999999, GREATEST(1, $e)) AS BIGINT)"
      def rnd(i: Int) = {
        val mcols = (1 to 4).map(k => clamp(
          s"(1000000 * SUM(n_pairs * post * a$k)) // SUM(n_pairs * post)"
        ) + s" AS m$k").mkString(", ")
        val ucols = (1 to 4).map(k => clamp(
          s"(1000000 * SUM(n_pairs * (1000000 - post) * a$k)) // " +
            s"SUM(n_pairs * (1000000 - post))") + s" AS u$k")
          .mkString(", ")
        s""",
        |e$i AS (
        |  SELECT pat.*, $post AS post FROM pat CROSS JOIN p${i - 1} p),
        |p$i AS (
        |  SELECT CAST(SUM(n_pairs * post) // SUM(n_pairs) AS BIGINT)
        |    AS lam, $mcols, $ucols
        |  FROM e$i)""".stripMargin
      }
      "WITH " + fsCandSql + """,
      |pat AS (
      |  SELECT a1, a2, a3, a4, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(mt) AS BIGINT) AS n_true
      |  FROM cand GROUP BY 1, 2, 3, 4),
      |p0 AS (SELECT CAST(100000 AS BIGINT) lam,
      |  CAST(900000 AS BIGINT) m1, CAST(900000 AS BIGINT) m2,
      |  CAST(900000 AS BIGINT) m3, CAST(900000 AS BIGINT) m4,
      |  CAST(100000 AS BIGINT) u1, CAST(100000 AS BIGINT) u2,
      |  CAST(100000 AS BIGINT) u3, CAST(100000 AS BIGINT) u4)"""
        .stripMargin +
        rnd(1) + rnd(2) + s"""
      |SELECT CAST(pat.a1 AS BIGINT) AS a_title,
      |  CAST(pat.a2 AS BIGINT) AS a_lang,
      |  CAST(pat.a3 AS BIGINT) AS a_source,
      |  CAST(pat.a4 AS BIGINT) AS a_ncb,
      |  pat.n_pairs, pat.n_true, p.lam AS lambda_ppm,
      |  CAST($post AS BIGINT) AS post_ppm,
      |  CAST(CASE WHEN ($post) >= 500000 THEN 1 ELSE 0 END AS BIGINT)
      |    AS em_link
      |FROM pat CROSS JOIN p2 p
      |ORDER BY a_title, a_lang, a_source, a_ncb""".stripMargin
    }) { (s, d) =>
    val pat = fsCandidates(s, d)
      .groupBy(col("a1"), col("a2"), col("a3"), col("a4"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("mt")).as("n_true"))
    // Eager localCheckpoint + pin, NOT cache(): each EM round
    // crossJoins pat against the broadcast parameter row, and the
    // final select reads pat again — concurrent broadcast-subtree
    // jobs race on an unpopulated cache and each recompute the
    // candidate agg (the measured q310 race; see Checkpoints).
    val patP = graft.functions.Checkpoints.pin(pat.localCheckpoint())
    def term(k: Int, mu: String) =
      s"CASE WHEN a$k = 1 THEN $mu$k ELSE 1000000L - $mu$k END"
    def prod(mu: String) = (2 to 4).foldLeft(term(1, mu))((e, k) =>
      s"(($e) * (${term(k, mu)})) div 1000000L")
    val postSql = s"(1000000L * (lam * (${prod("m")}))) div " +
      s"greatest(1L, lam * (${prod("m")}) + " +
      s"(1000000L - lam) * (${prod("u")}))"
    def clampC(c: Column) =
      least(lit(999999L), greatest(lit(1L), c))
    var p: DataFrame = s.range(1).select(
      (Seq(lit(100000L).as("lam")) ++
        (1 to 4).map(k => lit(900000L).as(s"m$k")) ++
        (1 to 4).map(k => lit(100000L).as(s"u$k"))): _*)
    (1 to 2).foreach { _ =>
      val e = patP.crossJoin(broadcast(p))
        .withColumn("post", expr(postSql))
      val mstep =
        Seq(expr("sum(n_pairs * post) div sum(n_pairs)").as("lam")) ++
          (1 to 4).map(k => clampC(expr(
            s"(1000000L * sum(n_pairs * post * a$k)) div " +
              "sum(n_pairs * post)")).as(s"m$k")) ++
          (1 to 4).map(k => clampC(expr(
            s"(1000000L * sum(n_pairs * (1000000L - post) * a$k)) div " +
              "sum(n_pairs * (1000000L - post))")).as(s"u$k"))
      p = e.agg(mstep.head, mstep.tail: _*)
    }
    patP.crossJoin(broadcast(p))
      .select(col("a1").as("a_title"), col("a2").as("a_lang"),
        col("a3").as("a_source"), col("a4").as("a_ncb"),
        col("n_pairs"), col("n_true"), col("lam").as("lambda_ppm"),
        expr(postSql).as("post_ppm"),
        (expr(postSql) >= 500000L).cast("long").as("em_link"))
      .orderBy("a_title", "a_lang", "a_source", "a_ncb")
  }

  // ---------------------------------------------------------------------
  // q326 — Chao1 vocabulary-richness estimator
  // ---------------------------------------------------------------------

  /** q326 — CHAO1 unseen-vocabulary estimator (Chao 1984, the
    * bias-corrected form; Good 1953 for the coverage companion): how
    * many word types does the corpus's POPULATION hold beyond the V
    * observed — the capture-recapture answer to the question q249's
    * Heaps-law fit extrapolates and q273's Good–Turing mass answers
    * probabilistically. From the token-frequency census alone:
    * singletons F1, doubletons F2,
    *   Chao1 = V + F1(F1−1)/(2(F2+1))  (bias-corrected — defined even
    * at F2 = 0), here floored on the milli grid; Good's sample
    * coverage Ĉ = 1 − F1/N in exact ppm. On this 31-type synthetic
    * vocabulary F1 = 0 at any tested SF, so Chao1 = V and Ĉ = 1 —
    * the honest saturated-corpus reading (stated; the estimator's
    * discriminating power needs a long-tail vocabulary, which the
    * oracle pins arithmetically all the same).
    *
    * Scale: one exploded token count (map-side combinable), one
    * |V|-bounded frequency census, three scalar aggregates. All
    * int64: 1000·F1·(F1−1) wraps only past F1 ≈ 3·10⁶ types
    * (beyond: DECIMAL, the q312 hatch). */
  val q326 = QueryDef(
    "q326_chao1_richness",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok
      |  GROUP BY 1),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |    CAST(SUM(c) AS BIGINT) AS n
      |  FROM tf)
      |SELECT v AS v_types, f1, f2, n AS n_tokens,
      |  CAST(1000 * v + (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1))
      |    AS BIGINT) AS chao1_milli,
      |  CAST(1000000 - (1000000 * f1) // n AS BIGINT) AS coverage_ppm
      |FROM agg WHERE n > 0""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("v"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"),
        sum(col("c")).as("n"))
      .filter(col("n") > 0)
      .select(col("v").as("v_types"), col("f1"), col("f2"),
        col("n").as("n_tokens"),
        expr("1000L * v + (1000L * f1 * (f1 - 1)) div (2 * (f2 + 1))")
          .as("chao1_milli"),
        expr("1000000L - (1000000L * f1) div n").as("coverage_ppm"))
  }

  // ---------------------------------------------------------------------
  // q327 — first-occurrence novelty census
  // ---------------------------------------------------------------------

  /** q327 — FIRST-OCCURRENCE NOVELTY census: for every document, what
    * fraction of its bigram types appears here FIRST (no earlier
    * doc_id contains it)? The per-document ordering signal behind
    * dedup-aware curation (Lee et al. 2022 showed duplicated n-grams
    * dominate web corpora; a doc whose types all premiered earlier is
    * the marginal-value-zero candidate q321/q328 price at source
    * grain — this is the doc-grain view). doc_id order is the
    * DECLARED arrival order (the q66 incremental-dedup convention).
    * Per doc: bigram types, novel types (min-doc_id ownership —
    * each type credited to exactly ONE doc, so novelty masses are
    * conservation-exact: Σ novel = |V|), novelty ratio in exact ppm,
    * rolled into the (source, novelty-decile) census.
    *
    * Scale: one exploded DISTINCT (doc, bigram) frame, one min-keyed
    * census over it, one join back on the bigram key, two keyed aggs
    * — all linear, one shuffle each, nothing pairwise. */
  val q327 = QueryDef(
    "q327_novelty_census",
    """WITH l AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, source, toks,
      |    unnest(range(1, len(toks))) AS i
      |  FROM l WHERE len(toks) >= 2),
      |db AS (
      |  SELECT DISTINCT doc_id, source,
      |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS b
      |  FROM e),
      |fo AS (SELECT b, CAST(MIN(doc_id) AS BIGINT) AS fd FROM db
      |  GROUP BY 1),
      |pd AS (
      |  SELECT db.doc_id, db.source,
      |    CAST(COUNT(*) AS BIGINT) AS types,
      |    CAST(SUM(CASE WHEN fo.fd = db.doc_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS novel
      |  FROM db JOIN fo ON fo.b = db.b
      |  GROUP BY 1, 2)
      |SELECT source,
      |  CAST(((1000000 * novel) // types) // 100000 AS BIGINT)
      |    AS nov_band,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(types) AS BIGINT) AS sum_types,
      |  CAST(SUM(novel) AS BIGINT) AS sum_novel
      |FROM pd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val db = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"), col("source"),
        concat(expr("element_at(toks, i)"), lit(" "),
          expr("element_at(toks, i + 1)")).as("b"))
      .distinct()
    val fo = db.groupBy(col("b")).agg(min(col("doc_id")).as("fd"))
    db.join(fo, "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("types"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("novel"))
      .groupBy(col("source"),
        expr("((1000000L * novel) div types) div 100000")
          .as("nov_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("types")).as("sum_types"),
        sum(col("novel")).as("sum_novel"))
      .orderBy("source", "nov_band")
  }

  // ---------------------------------------------------------------------
  // q331 — Hill tail-index estimator of the token-frequency tail
  // ---------------------------------------------------------------------

  /** q331 — HILL TAIL-INDEX estimator (Hill 1975) of the token
    * frequency distribution's upper tail: the conditional-MLE
    * companion to q184's Zipf fit — q184 regresses the WHOLE log-log
    * rank curve, Hill reads only the k largest order statistics,
    *   1/α̂ = (1/k) Σ_{i≤k} ln(f_(i) / f_(k+1)),
    * so it prices exactly the heavy head that sizes every
    * heavy-hitter structure (q121's Misra–Gries width, q78's
    * thresholds). Spec constant k = 8; order statistics are the
    * top-(k+1) census rows by (count desc, token) — fully tie-broken,
    * so both engines pick the identical multiset. Every ln rides the
    * LangModel milli-nat grid (floored per ROW, then exact integer
    * sums — the q130 portability contract), and α̂ appears in milli
    * as ⌊10⁶ / H_mnat⌋ with H_mnat = ⌊Σ/k⌋ clamped ≥ 1 (a flat head
    * — all top frequencies equal — reads as the α → ∞ sentinel 10⁶,
    * stated). Emits nothing when the vocabulary has < k+1 types.
    *
    * Scale: one exploded token count (map-side combinable), one
    * |V|-bounded census, a 9-row TakeOrdered, scalar folds — the
    * corpus touches only the first agg. */
  val q331 = QueryDef(
    "q331_hill_tail_index", {
      import graft.functions.LangModel.mnatSql
      s"""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok
      |  GROUP BY 1),
      |t8 AS MATERIALIZED (
      |  SELECT c FROM tf ORDER BY c DESC, t LIMIT 8),
      |k1 AS MATERIALIZED (
      |  SELECT CAST(MIN(c) AS BIGINT) AS ck, CAST(COUNT(*) AS BIGINT)
      |    AS m
      |  FROM (SELECT c FROM tf ORDER BY c DESC, t LIMIT 9)),
      |h AS (
      |  SELECT CAST(SUM(${mnatSql("t8.c")}) AS BIGINT)
      |      - 8 * ${mnatSql("MAX(k1.ck)")} AS hsum,
      |    MAX(k1.ck) AS ck, MAX(k1.m) AS m
      |  FROM t8 CROSS JOIN k1)
      |SELECT CAST(8 AS BIGINT) AS k, ck AS f_kplus1,
      |  CAST(hsum AS BIGINT) AS sum_lnratio_mnat,
      |  CAST(hsum // 8 AS BIGINT) AS hill_inv_mnat,
      |  CAST(1000000 // GREATEST(1, hsum // 8) AS BIGINT)
      |    AS alpha_milli
      |FROM h WHERE m >= 9""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    import graft.functions.Checkpoints
    // eager checkpoint + pin, not cache(): tf feeds the two
    // TakeOrdered subtrees consumed concurrently (q310 race shape)
    val tf = Checkpoints.pin(
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint())
    val t8 = tf.orderBy(col("c").desc, col("t")).limit(8).select("c")
    val k1 = tf.orderBy(col("c").desc, col("t")).limit(9)
      .agg(min(col("c")).as("ck"), count(lit(1)).as("m"))
    t8.crossJoin(broadcast(k1))
      .agg((sum(mnat(col("c"))) - lit(8L) * mnat(max(col("ck"))))
          .as("hsum"),
        max(col("ck")).as("ck"), max(col("m")).as("m"))
      .filter(col("m") >= 9)
      .select(lit(8L).as("k"), col("ck").as("f_kplus1"),
        col("hsum").as("sum_lnratio_mnat"),
        expr("hsum div 8").as("hill_inv_mnat"),
        expr("1000000L div greatest(1L, hsum div 8)").as("alpha_milli"))
  }

  // ---------------------------------------------------------------------
  // q337 — Hill-numbers diversity ladder per source
  // ---------------------------------------------------------------------

  /** q337 — HILL-NUMBERS diversity ladder (Hill 1973 — the ecologist,
    * not q331's tail statistician): the three classic diversity
    * orders of each source's token distribution in ONE frame —
    * q = 0 richness (type count), q = 1 Shannon entropy (q162's
    * statistic, here in milli-nats via the exact grid identity
    * H = ⌊Σ c·(mnat(n) − mnat(c))⌋/n), q = 2 inverse Simpson
    * n²/Σc² in exact milli — plus Pielou evenness H/ln(richness).
    * The orders answer different curation questions: richness bounds
    * vocabulary structures, Shannon weighs typical tokens, inverse
    * Simpson counts "effective heavy types" (the dedup-relevant
    * number: a source with inv-Simpson ≈ 5 is five tokens in a
    * trench coat no matter its richness). All exact int64:
    * inverse-Simpson's 1000·n² wraps past n ≈ 3·10⁶ tokens/source
    * (documented; beyond: DECIMAL, the q312 hatch).
    *
    * Scale: one exploded (source, token) count (map-side
    * combinable), one |S|·|V|-bounded census, one |S|-row fold. */
  val q337 = QueryDef(
    "q337_hill_diversity", {
      import graft.functions.LangModel.mnatSql
      s"""WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |tf AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |sn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS q0,
      |    CAST(SUM(c * c) AS BIGINT) AS sc2
      |  FROM tf GROUP BY 1),
      |hs AS (
      |  SELECT tf.source,
      |    CAST(SUM(tf.c * (${mnatSql("sn.n")} - ${mnatSql("tf.c")}))
      |      // MAX(sn.n) AS BIGINT) AS h_mnat
      |  FROM tf JOIN sn ON sn.source = tf.source GROUP BY 1)
      |SELECT sn.source, sn.n AS n_tokens, sn.q0 AS q0_types,
      |  hs.h_mnat AS shannon_mnat,
      |  CAST((1000 * sn.n * sn.n) // sn.sc2 AS BIGINT)
      |    AS inv_simpson_milli,
      |  CAST((1000 * hs.h_mnat) // GREATEST(1, ${mnatSql("sn.q0")})
      |    AS BIGINT) AS evenness_milli
      |FROM sn JOIN hs ON hs.source = sn.source
      |ORDER BY sn.source""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    import graft.functions.Checkpoints
    // eager checkpoint + pin, not cache(): tf feeds the totals census
    // and the entropy join consumed concurrently (q310 race shape)
    val tf = Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint())
    val sn = tf.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("q0"),
        sum(col("c") * col("c")).as("sc2"))
    val hs = tf.join(broadcast(sn.select(col("source"), col("n"))),
        "source")
      .groupBy(col("source"))
      .agg((sum(col("c") * (mnat(col("n")) - mnat(col("c"))))
        .cast("long")).as("hnum"),
        max(col("n")).as("nn"))
      .select(col("source"), expr("hnum div nn").as("h_mnat"))
    sn.join(hs, "source")
      .select(col("source"), col("n").as("n_tokens"),
        col("q0").as("q0_types"), col("h_mnat").as("shannon_mnat"),
        expr("(1000L * n * n) div sc2").as("inv_simpson_milli"),
        expr("(1000L * h_mnat) div greatest(1L," +
          " cast(floor(ln(cast(q0 as double)) * 1000) as bigint))")
          .as("evenness_milli"))
      .orderBy("source")
  }

  /** q346 — GOPHER REPETITION rules (Rae et al. 2021 Table A1, the
    * repetition half — q85 carries the word-level gates): the
    * boilerplate/loop detector every crawl-curation pipeline runs.
    * Per document, four exact-ppm signals on the house grids:
    *   top_word_char_ppm   — largest single-token character mass
    *     max_w(c_w·len(w)) / Σc·len (plain MAX, tie-free by
    *     construction — the Gopher "fraction of characters in the
    *     most common n-gram" with the mass itself as the statistic),
    *   top_bigram_char_ppm — same for bigrams (chars of both words),
    *   dup_word_ppm        — occurrences of words appearing ≥2× / n,
    *   dup_bigram_ppm      — same at bigram grain.
    * Census per source: doc count, floored mean of each signal, and
    * failure counts under DECLARED cuts re-anchored to this corpus'
    * token grid (top word > 18 %, top bigram > 9 %, dup bigram >
    * 12 % — Gopher's own 0.20/0.18 line re-expressed where this
    * synthetic vocabulary actually separates; both SFs non-degenerate,
    * the q342 discipline). Single-token documents carry no bigram and
    * are excluded by the join; all-empty-token documents
    * (separator-only text, tc = 0) are excluded by an explicit
    * tc > 0 guard mirrored in both engines (stated; this corpus has
    * neither — without the guard Spark's div nulls where DuckDB's //
    * raises, a silent engine divergence).
    *
    * Scale: two per-doc keyed censuses (word, bigram — map-side
    * combinable, explode ×n_tokens), one |docs|-row join, one
    * |sources|-row census — no window, no self-join, linear at any
    * corpus size. */
  val q346 = QueryDef(
    "q346_gopher_repetition",
    """WITH t0 AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks
      |  FROM documents),
      |tok AS (SELECT doc_id, source, unnest(toks) AS t FROM t0),
      |wc AS (
      |  SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2, 3),
      |dtot AS (
      |  SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(c * length(t)) AS BIGINT) AS tc,
      |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
      |      AS dupocc,
      |    CAST(MAX(c * length(t)) AS BIGINT) AS topchars
      |  FROM wc GROUP BY 1, 2),
      |p AS (
      |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      |  FROM t0),
      |bgc AS (
      |  SELECT doc_id,
      |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS b,
      |    CAST(COUNT(*) AS BIGINT) AS cb
      |  FROM p GROUP BY 1, 2),
      |bgt AS (
      |  SELECT doc_id, CAST(SUM(cb) AS BIGINT) AS nb,
      |    CAST(MAX(cb * (length(b) - 1)) AS BIGINT) AS top2chars,
      |    CAST(SUM(CASE WHEN cb >= 2 THEN cb ELSE 0 END) AS BIGINT)
      |      AS dup2
      |  FROM bgc GROUP BY 1),
      |per AS (
      |  SELECT d.source,
      |    1000000 * d.topchars // d.tc AS t1,
      |    1000000 * b.top2chars // d.tc AS t2,
      |    1000000 * d.dupocc // d.n AS dw,
      |    1000000 * b.dup2 // b.nb AS d2
      |  FROM dtot d JOIN bgt b ON b.doc_id = d.doc_id
      |  WHERE d.tc > 0)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
      |  CAST(SUM(t1) // COUNT(*) AS BIGINT) AS top_word_char_ppm,
      |  CAST(SUM(t2) // COUNT(*) AS BIGINT) AS top_bigram_char_ppm,
      |  CAST(SUM(dw) // COUNT(*) AS BIGINT) AS dup_word_ppm,
      |  CAST(SUM(d2) // COUNT(*) AS BIGINT) AS dup_bigram_ppm,
      |  CAST(SUM(CASE WHEN t1 > 180000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_top_word,
      |  CAST(SUM(CASE WHEN t2 > 90000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_top_bigram,
      |  CAST(SUM(CASE WHEN d2 > 120000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_dup_bigram
      |FROM per GROUP BY source ORDER BY source""".stripMargin) {
    (s, d) =>
    import graft.functions.Checkpoints
    val t0 = Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .localCheckpoint())
    val dtot = t0
      .select(col("doc_id"), col("source"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("source"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * length(col("t"))).as("tc"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dupocc"),
        max(col("c") * length(col("t"))).as("topchars"))
    val bgt = t0
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          | i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin))
        .as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("cb"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cb")).as("nb"),
        max(col("cb") * (length(col("b")) - 1)).as("top2chars"),
        sum(when(col("cb") >= 2, col("cb")).otherwise(0L)).as("dup2"))
    dtot.join(bgt, "doc_id")
      // tc > 0 guard in BOTH engines (round-11 ADVICE): a document
      // whose tokens are all empty strings (separator-only text)
      // passes size >= 2 with tc = 0, where Spark's div yields NULL
      // but DuckDB's // raises division-by-zero — an engine
      // divergence. nb needs no guard: every joined doc has >= 1
      // bigram, so nb >= 1 by construction.
      .filter(col("tc") > 0L)
      .select(col("source"),
        expr("1000000L * topchars div tc").as("t1"),
        expr("1000000L * top2chars div tc").as("t2"),
        expr("1000000L * dupocc div n").as("dw"),
        expr("1000000L * dup2 div nb").as("d2"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        expr("sum(t1) div count(1)").as("top_word_char_ppm"),
        expr("sum(t2) div count(1)").as("top_bigram_char_ppm"),
        expr("sum(dw) div count(1)").as("dup_word_ppm"),
        expr("sum(d2) div count(1)").as("dup_bigram_ppm"),
        sum(when(col("t1") > 180000L, 1L).otherwise(0L))
          .as("f_top_word"),
        sum(when(col("t2") > 90000L, 1L).otherwise(0L))
          .as("f_top_bigram"),
        sum(when(col("d2") > 120000L, 1L).otherwise(0L))
          .as("f_dup_bigram"))
      .orderBy(col("source"))
  }

  /** q348 — per-document CHARACTER-ENTROPY gate (the C4/CCNet
    * "gibberish" filter: Raffel et al. 2020's heuristic line, Wenzek
    * et al. 2020 §4.3 — a document whose character distribution is
    * too concentrated is boilerplate, binary junk, or a repetition
    * loop; q337 reads token entropy per SOURCE, this is the per-DOC
    * curation cut): H = Σ_c k_c·(ln n − ln k_c)/n over the document's
    * non-space characters, exact on the milli-nat grid
    * ([[graft.functions.LangModel.mnat]], floored per-doc — stated).
    * Census per source: docs, floored mean/min/max H, and fail counts
    * under two DECLARED cuts — soft H < 2800 mnat and hard H < 2650
    * mnat (re-anchored where this corpus' ~15-letter char
    * distribution actually separates: measured spread 2521–3012 at
    * both SFs, non-degenerate — the q342 discipline).
    *
    * Scale: one per-(doc, char) keyed census (explode ×n_chars,
    * map-side combinable; alphabet-bounded ≤ |charset| rows per doc),
    * one |docs|-row join, one |sources|-row census — linear, no
    * window, no self-join. */
  val q348 = QueryDef(
    "q348_char_entropy", {
      import graft.functions.LangModel.mnatSql
      s"""WITH ch AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(replace(text, ' ', ''), '')) AS c
      |  FROM documents),
      |cc AS (
      |  SELECT doc_id, source, c, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM ch WHERE c <> '' GROUP BY 1, 2, 3),
      |dn AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM cc
      |  GROUP BY 1),
      |dt AS (
      |  SELECT cc.source, cc.doc_id,
      |    CAST(SUM(cc.k * (${mnatSql("dn.n")} - ${mnatSql("cc.k")}))
      |      // MAX(dn.n) AS BIGINT) AS hm
      |  FROM cc JOIN dn ON dn.doc_id = cc.doc_id GROUP BY 1, 2)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
      |  CAST(SUM(hm) // COUNT(*) AS BIGINT) AS mean_h_mnat,
      |  CAST(MIN(hm) AS BIGINT) AS min_h_mnat,
      |  CAST(MAX(hm) AS BIGINT) AS max_h_mnat,
      |  CAST(SUM(CASE WHEN hm < 2800 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_soft,
      |  CAST(SUM(CASE WHEN hm < 2650 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS f_hard
      |FROM dt GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.functions.LangModel.mnat
    import graft.functions.Checkpoints
    // cc feeds the per-doc total AND the entropy fold (q310 race shape)
    val cc = Checkpoints.pin(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(translate(col("text"), " ", ""), "")).as("c"))
        .filter(col("c") =!= "")
        .groupBy(col("doc_id"), col("source"), col("c"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint())
    val dn = cc.groupBy(col("doc_id")).agg(sum(col("k")).as("n"))
    val dt = cc.join(dn, "doc_id")
      .groupBy(col("source"), col("doc_id"))
      .agg((sum(col("k") * (mnat(col("n")) - mnat(col("k"))))
        .cast("long")).as("hnum"), max(col("n")).as("nn"))
      .select(col("source"), expr("hnum div nn").as("hm"))
    dt.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        expr("sum(hm) div count(1)").as("mean_h_mnat"),
        min(col("hm")).as("min_h_mnat"),
        max(col("hm")).as("max_h_mnat"),
        sum(when(col("hm") < 2800L, 1L).otherwise(0L)).as("f_soft"),
        sum(when(col("hm") < 2650L, 1L).otherwise(0L)).as("f_hard"))
      .orderBy(col("source"))
  }

  /** q352 — inverted-index POSTING-LIST COMPRESSION census (the
    * storage-planning read an index build consults before choosing
    * its posting encoding — at 100 TB the difference between raw
    * 64-bit ids, varint deltas, and Elias–Fano is the index's disk
    * footprint): postings = DISTINCT (term, doc_id) over whitespace
    * tokens; per term the sorted doc-id list is delta-coded (first
    * gap = id₀ + 1, i.e. the delta from sentinel −1; every gap ≥ 1),
    * and three exact storage costs are censused per df band
    * (band = bit length of document frequency — power-of-two df
    * buckets, the shape of every df histogram):
    *   gap_bits     = Σ bitlen(gap)          (the entropy-ish floor)
    *   varint_bytes = Σ ⌈bitlen(gap)/7⌉      (LEB128 group varint)
    *   ef_bits      = Σ df·(l+2), l = max(0, ⌊log₂(U/df)⌋)
    * — the quasi-succinct Elias–Fano bound (Elias 1974; Vigna 2013),
    * with ⌊log₂(U/df)⌋ computed EXACTLY as bitlen(U div df) − 1
    * (valid for U ≥ df; floor(log₂) of a real x ≥ 1 equals the bit
    * length of ⌊x⌋ minus one — no float log anywhere, the q339
    * lesson). bitlen is `length(bin(x))` in BOTH engines (unpadded
    * binary strings, verified). raw_bits = 64·postings; the ppm
    * ratios are the report's headline.
    *
    * Scale shape: token explode → one DISTINCT (term, doc) keyed
    * dedup, gaps via a per-term keyed window (hash-partitioned on
    * term, never global), U on a broadcast one-row frame, then one
    * map-side-combined census over ≤ 64 bands. */
  val q352 = QueryDef(
    "q352_posting_compression",
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |p AS (
      |  SELECT DISTINCT term, doc_id FROM t WHERE term <> ''),
      |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM documents),
      |g AS (
      |  SELECT term, doc_id - COALESCE(LAG(doc_id) OVER
      |      (PARTITION BY term ORDER BY doc_id), -1) AS gap
      |  FROM p),
      |tc AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(length(bin(gap))) AS BIGINT) AS gbits,
      |    CAST(SUM((length(bin(gap)) + 6) // 7) AS BIGINT) AS vbytes
      |  FROM g GROUP BY 1),
      |tf AS (
      |  SELECT length(bin(df)) AS band, df, gbits, vbytes,
      |    df * (GREATEST(0, length(bin(nu // df)) - 1) + 2) AS efb
      |  FROM tc CROSS JOIN u)
      |SELECT CAST(band AS BIGINT) AS band,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(df) AS BIGINT) AS n_postings,
      |  CAST(SUM(gbits) AS BIGINT) AS gap_bits,
      |  CAST(SUM(vbytes) AS BIGINT) AS varint_bytes,
      |  CAST(SUM(efb) AS BIGINT) AS ef_bits,
      |  CAST(SUM(df) * 64 AS BIGINT) AS raw_bits,
      |  CAST(SUM(vbytes) * 8 * 1000000 // (SUM(df) * 64) AS BIGINT)
      |    AS varint_ppm,
      |  CAST(SUM(efb) * 1000000 // (SUM(df) * 64) AS BIGINT) AS ef_ppm
      |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val p = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("term"), col("doc_id")).distinct()
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val g = p.withColumn("gap",
      col("doc_id") - coalesce(lag(col("doc_id"), 1).over(wT), lit(-1L)))
    val tc = g.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(length(bin(col("gap")))).as("gbits"),
        sum(expr("(length(bin(gap)) + 6) div 7")).as("vbytes"))
    val u = docs.agg(count(lit(1)).as("nu"))
    tc.crossJoin(broadcast(u))
      .select(length(bin(col("df"))).cast("long").as("band"),
        col("df"), col("gbits"), col("vbytes"),
        (col("df") * (greatest(lit(0),
          expr("length(bin(nu div df)) - 1")) + 2)).as("efb"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("n_postings"),
        sum(col("gbits")).as("gap_bits"),
        sum(col("vbytes")).as("varint_bytes"),
        sum(col("efb")).as("ef_bits"))
      .withColumn("raw_bits", col("n_postings") * 64)
      .withColumn("varint_ppm",
        expr("varint_bytes * 8 * 1000000 div raw_bits"))
      .withColumn("ef_ppm", expr("ef_bits * 1000000 div raw_bits"))
      .orderBy("band")
  }

  /** q353 — LCP ARRAY construction (Manber–Myers / Kasai output; the
    * index artifact that upgrades the q181 suffix array into a full
    * string index — longest-repeated-substring, suffix-interval and
    * document-listing queries all read LCP[i]): for every position in
    * the bounded slice (doc_id < 50, the q181 oracle-cost contract),
    * the length of the longest common prefix between its suffix's
    * 64-truncated prefix and its PREDECESSOR's in suffix-array order
    * (first SA position → 0).
    *
    * Engine = BINARY LIFTING over the prefix-doubling rank levels
    * ([[graft.functions.SuffixRanks.rankLevels]], ordered): equal
    * level-64 ranks resolve immediately (lcp = min remaining length,
    * capped 64 — the truncation contract); unequal pairs descend
    * k = 32, 16, 8, advancing h += k whenever the level-k ranks at
    * (doc, i+h) match — each level is ONE keyed equi-join per side on
    * 8-byte ranks — then the sub-8 residual is read off an 8-byte
    * probe against the encoded text (7 bounded comparisons). The
    * advance is sound because rank_k(a+h) = rank_k(b+h) ⟺ the next k
    * characters match exactly (truncated-equality with one side
    * ended would force the full suffixes equal — level-64-equal, the
    * other branch). Adjacency comes from the distributed dense rank
    * ([[graft.functions.Ranks.rowNumberGlobal]] on (r, pos)) + one
    * self-join on sidx−1 — no global window anywhere. The oracle
    * sorts the materialized 64-prefix strings and counts matching
    * prefix lengths positionally — the |slice|·64-byte shuffle shape
    * the rank machinery exists to avoid at 100 TB. */
  val q353 = QueryDef(
    "q353_lcp_array",
    """WITH d AS (
      |  SELECT doc_id, text, length(text) AS len FROM documents
      |  WHERE doc_id < 50),
      |o AS (
      |  SELECT doc_id, text, len,
      |    SUM(len) OVER (ORDER BY doc_id) - len AS off FROM d),
      |e AS (
      |  SELECT doc_id AS doc, text, len, off, unnest(range(0, len)) AS i
      |  FROM o),
      |p AS (
      |  SELECT doc, CAST(i AS BIGINT) AS i, off + i + 1 AS pos,
      |    substr(text, CAST(i + 1 AS INT), 64) AS pfx FROM e),
      |s AS (
      |  SELECT doc, i, pfx, LAG(pfx) OVER (ORDER BY pfx, pos) AS prev
      |  FROM p),
      |l AS (
      |  SELECT doc, i, prev, pfx, unnest(range(1, 65)) AS j FROM s)
      |SELECT doc, i,
      |  CAST(COALESCE(SUM(CASE WHEN j <= length(prev)
      |    AND j <= length(pfx)
      |    AND substr(prev, 1, CAST(j AS INT))
      |      = substr(pfx, 1, CAST(j AS INT))
      |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS lcp
      |FROM l GROUP BY doc, i ORDER BY doc, i""".stripMargin) { (s, d) =>
    val docsIn = Tables.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id").cast("long").as("doc"), col("text"))
    val levels = graft.functions.SuffixRanks
      .rankLevels(docsIn, L = 64, ordered = true)
    val lv = levels.toMap
    levels.collect { case (k, f) if !Set(8, 16, 32, 64)(k) =>
      graft.functions.Checkpoints.free(f)
    }
    require(Seq(8, 16, 32, 64).forall(lv.contains),
      "q353 lifting expects levels 8/16/32/64 (ASCII base step)")
    val sa = graft.functions.Ranks.rowNumberGlobal(
      lv(64).select(col("doc"), col("i"), col("pos"), col("r")),
      col("r"), col("pos"), "sidx")
    val cur = sa.select(col("doc"), col("i"), col("r"), col("sidx"))
    val prevS = sa.select(col("doc").as("pdoc"), col("i").as("pi"),
      col("r").as("pr"), (col("sidx") + 1).as("sidx"))
    val lens = docsIn.select(col("doc"),
      length(encode(col("text"), "UTF-8")).cast("long").as("len"))
    val base = cur.join(prevS, Seq("sidx"), "left")
    val firstRow = base.filter(col("pr").isNull)
      .select(col("doc"), col("i"), lit(0L).as("lcp"))
    val eqRows = base.filter(col("pr").isNotNull && col("pr") === col("r"))
      .join(broadcast(lens), Seq("doc"))
      .join(broadcast(lens.select(col("doc").as("pdoc"),
        col("len").as("plen"))), Seq("pdoc"))
      .select(col("doc"), col("i"),
        least(lit(64L), col("len") - col("i"),
          col("plen") - col("pi")).as("lcp"))
    var ne = base.filter(col("pr").isNotNull && col("pr") =!= col("r"))
      .select(col("doc"), col("i"), col("pdoc"), col("pi"))
      .withColumn("h", lit(0L))
    Seq(32, 16, 8).foreach { k =>
      val ra = lv(k).select(col("doc").as("qd"), col("i").as("qi"),
        col("r").as("rka"))
      val rb = lv(k).select(col("doc").as("qd2"), col("i").as("qi2"),
        col("r").as("rkb"))
      ne = ne
        .join(ra, ne("doc") === ra("qd") &&
          ra("qi") === ne("i") + ne("h"), "left")
        .join(rb, ne("pdoc") === rb("qd2") &&
          rb("qi2") === ne("pi") + ne("h"), "left")
        .withColumn("h", when(col("rka").isNotNull &&
          col("rka") === col("rkb"), col("h") + k).otherwise(col("h")))
        .select(col("doc"), col("i"), col("pdoc"), col("pi"), col("h"))
    }
    val bins = docsIn.select(col("doc"),
      encode(col("text"), "UTF-8").as("bin"))
    val res = (1 to 7).map { j =>
      when(length(col("g1")) >= j && length(col("g2")) >= j &&
        expr(s"substr(g1, 1, $j)") === expr(s"substr(g2, 1, $j)"), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    val neRows = ne
      .join(broadcast(bins.select(col("doc"), col("bin").as("bin_c"))),
        Seq("doc"))
      .join(broadcast(bins.select(col("doc").as("pdoc"),
        col("bin").as("bin_p"))), Seq("pdoc"))
      .withColumn("g1", expr("substr(bin_c, cast(i + h + 1 as int), 8)"))
      .withColumn("g2", expr("substr(bin_p, cast(pi + h + 1 as int), 8)"))
      .select(col("doc"), col("i"), (col("h") + res).as("lcp"))
    firstRow.union(eqRows).union(neRows).orderBy("doc", "i")
  }

  /** q354 — BWT RUN-FRACTION compressibility census (Burrows &
    * Wheeler 1994; the run count r is the size parameter of
    * run-length FM-indexes, Mäkinen & Navarro 2005, and r/n is a
    * classic corpus compressibility estimate — the oracle-able twin
    * of the deflate-ratio quality filter RedPajama-class pipelines
    * apply, which no independent SQL engine can replay): per
    * document, suffixes are ordered by their 64-truncated prefixes
    * (ties by position — the declared truncated-BWT contract; the
    * corpus-wide ordered rank restricted to one doc IS that doc's
    * suffix order), the BWT character at SA position j is the byte
    * at text[SA[j]−1] (sentinel 0 for the first suffix), and the
    * census reports per source how many RUNS the transformed corpus
    * has — fewer runs per char = more repetitive/templated text.
    *
    * Scale shape: the rank table is the same O(n log n)-shuffle
    * prefix-doubling build as q172 (8-byte payloads, never gram
    * strings); the BWT byte is computed map-side against the
    * broadcast-joined encoded doc, the per-doc suffix order is a
    * doc-keyed window over SKINNY rows (the text column is dropped
    * before the shuffle), and the census is one map-side-combined
    * aggregation over |sources| groups. */
  val q354 = QueryDef(
    "q354_bwt_runs",
    """WITH d AS (
      |  SELECT doc_id AS doc, source, text, length(text) AS len
      |  FROM documents WHERE length(text) > 0),
      |e AS (
      |  SELECT doc, source, text, len, unnest(range(0, len)) AS i
      |  FROM d),
      |p AS (
      |  SELECT doc, source, CAST(i AS BIGINT) AS i,
      |    substr(text, CAST(i + 1 AS INT), 64) AS pfx,
      |    CASE WHEN i = 0 THEN 0
      |      ELSE ord(substr(text, CAST(i AS INT), 1)) END AS bwt
      |  FROM e),
      |s AS (
      |  SELECT doc, source, bwt,
      |    LAG(bwt) OVER (PARTITION BY doc ORDER BY pfx, i) AS prev
      |  FROM p)
      |SELECT source,
      |  CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_pos,
      |  CAST(SUM(CASE WHEN prev IS NULL OR prev <> bwt
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
      |  CAST(SUM(CASE WHEN prev IS NULL OR prev <> bwt
      |    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
      |    AS runs_ppm
      |FROM s GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val docsIn = docs.select(col("doc_id").cast("long").as("doc"),
      col("text"))
    // wideBase: the BWT needs only the final suffix order — the
    // 16-byte packed base removes one full doubling round over the
    // whole corpus, the single most expensive relabel pass in the
    // suite (round-12 phase 3)
    val r = graft.functions.SuffixRanks.ranks(docsIn, L = 64,
      ordered = true, wideBase = true)
    val meta = docs.select(col("doc_id").as("doc"), col("source"),
      encode(col("text"), "UTF-8").as("bin"))
    // bwt byte computed map-side against the broadcast doc bytes,
    // then the text column is DROPPED before the window shuffle —
    // the per-doc sort moves only (doc, source, i, r, bwt)
    val withB = r.join(broadcast(meta), Seq("doc"))
      .select(col("doc"), col("source"), col("i"), col("r"),
        when(col("i") === 0, lit(0)).otherwise(expr(
          "ascii(decode(substr(bin, cast(i as int), 1), 'ISO-8859-1'))"))
          .as("bwt"))
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("r"), col("i"))
    withB
      .withColumn("prev", lag(col("bwt"), 1).over(wD))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_pos"),
        sum(when(col("prev").isNull || col("prev") =!= col("bwt"), 1L)
          .otherwise(0L)).as("n_runs"))
      .withColumn("runs_ppm", expr("n_runs * 1000000 div n_pos"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] =
    Seq(q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q41, q46,
      q48, q49, q50, q57, q59, q66, q67, q70, q73, q76, q77, q79, q84,
      q104, q107, q109, q110, q125, q127, q128, q137, q140, q145, q147,
      q156, q164, q165, q169, q172, q173, q175, q176, q177, q178, q181,
      q184, q185, q190, q192, q193, q200, q208, q232, q238, q249, q266,
      q269, q273, q276, q282, q296, q311, q326, q327, q331, q337,
      q346, q348, q352, q353, q354)
}
