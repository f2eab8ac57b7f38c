package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Okapi BM25 ranking (Robertson & Walker, SIGIR 1994) over the
  * `documents` table — the lexical half of a retrieval stack, next to
  * the embedding half in [[graft.queries.VectorQueries]]. Extension
  * surface per SURVEY §2.10 (the reference's recommendation serving has
  * no text search; a training-data pipeline needs one for targeted
  * corpus probes — "find the docs about X" before curation decisions).
  *
  * Integer port (the q77/q130 portability stance — no cross-engine
  * float except through the milli-nat quantizer):
  *
  *  - idf is the Lucene-style non-negative variant
  *    ln((N+1)/df) = mnat(N+1) − mnat(df), exact on the milli-nat grid
  *    (both arguments are integers; see [[LangModel.mnat]]). The
  *    classic Robertson idf goes negative for df > N/2, and negative
  *    operands would expose the floor-vs-truncate integer-division
  *    mismatch between engines — the non-negative form keeps every
  *    operand positive so Spark's `div` and DuckDB's `//` agree.
  *  - the tf saturation term tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
  *    k1 = 1.2, b = 0.75 is scaled to milli-units:
  *    norm_u = 250 + (750·dl·N) div Σdl        (≈ 1000·(1−b+b·dl/avgdl))
  *    denom  = tf·1000 + (1200·norm_u) div 1000
  *    score  = (idf_mnat · tf · 2200000) div denom   (2200000 = (k1+1)·10⁶)
  *    All operands positive longs; worst case ≈ idf 12·10³ × tf 10³ ×
  *    2.2·10⁶ ≈ 2.6·10¹³ — no overflow headroom issues.
  *
  * Scale shape: document length is a ROW-LOCAL `size(split)` — the
  * token stream is never exploded for the length census; the exploded
  * stream is filtered to the bounded query-term set BEFORE its
  * aggregation, so tf is ≤ |terms| rows per document and df falls out
  * of tf with a second tiny agg (tf persisted for its two consumers).
  * The corpus-length total rides a broadcast one-row frame (the q102
  * pattern). At 100 TB: two column-pruned scans, one keyed agg over a
  * term-filtered stream, no window.
  */
object Retrieval {

  /** Per-document BM25 scores for a bounded literal term set.
    * Output: (doc_id, n_terms, score_u), one row per document matching
    * ≥1 term, unordered. `score_u` is the integer-milli-unit score
    * described in the object doc; `n_terms` counts matched query
    * terms. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val g = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(g))
      .withColumn("idf_mnat",
        LangModel.mnat(col("n_docs") + 1) - LangModel.mnat(col("df")))
      .withColumn("norm_u",
        lit(250L) + expr("(750 * dl * n_docs) div total_len"))
      .withColumn("s", expr(
        "(idf_mnat * tf * 2200000) div (tf * 1000 + (1200 * norm_u) div 1000)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_u"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty,
    * SIGIR 2001) — the language-model complement to [[bm25]]:
    *
    *   score(q, d) = Σ_w ln( (tf(w,d) + μ·p(w|C)) / (dl + μ) )
    *
    * with p(w|C) = ctf(w)/|C|. Multiplying the log argument through
    * by |C| makes every ln argument an INTEGER:
    *
    *   score_milli = Σ_w [ mnat(tf·|C| + μ·ctf) − mnat(|C|) − mnat(dl + μ) ]
    *
    * so the whole score rides the milli-nat grid — same portability
    * contract as bm25, no float crosses the engine boundary. Unlike
    * bm25, EVERY document scores EVERY query term (smoothing gives
    * absent terms probability mass — that is the model's point), so
    * the per-doc frame is a bounded |terms|-way broadcast cross join,
    * with tf left-joined (absent → 0). A query term absent from the
    * ENTIRE corpus (ctf = 0) would have smoothed mass ln 0; such a
    * term produces no ctf row, so it drops out of every document's
    * score — identically on both engines. That truncates the model
    * (scores are over the corpus-attested query terms only), which
    * is the standard practical convention; callers needing strict
    * full-query semantics should pre-check their term list.
    *
    * Overflow headroom: tf·|C| ≤ 10³·10¹³ at 100 TB — inside a long.
    * Output: (doc_id, n_hit, score_milli), one row per document. */
  def dirichletQL(docs: DataFrame, terms: Seq[String],
                  mu: Long = 1000L): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val csize = dl.agg(sum(col("dl")).as("c"))
    val tok = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val ctf = tok.groupBy(col("token")).agg(count(lit(1)).as("ctf"))
    dl.crossJoin(broadcast(ctf))
      .join(tf, Seq("doc_id", "token"), "left_outer")
      .withColumn("tf0", coalesce(col("tf"), lit(0L)))
      .crossJoin(broadcast(csize))
      .withColumn("ts",
        LangModel.mnat(col("tf0") * col("c") + lit(mu) * col("ctf"))
          - LangModel.mnat(col("c"))
          - LangModel.mnat(col("dl") + mu))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("n_hit"),
        sum(col("ts")).as("score_milli"))
  }

  /** DuckDB CTE chain mirroring [[dirichletQL]] bit-for-bit, ending
    * in `ql(doc_id, n_hit, score_milli)`. Starts with `WITH`. */
  def dirichletQLCteSql(terms: Seq[String], mu: Long = 1000L): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    def mn(e: String) = LangModel.mnatSql(e)
    s"""WITH qdl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |qc AS (SELECT CAST(SUM(dl) AS BIGINT) AS c FROM qdl),
       |qtok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |qtf AS (
       |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM qtok WHERE token IN ($inList) GROUP BY 1, 2),
       |qctf AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS ctf
       |  FROM qtok WHERE token IN ($inList) GROUP BY 1),
       |qsc AS (
       |  SELECT qdl.doc_id,
       |    CASE WHEN qtf.tf IS NULL THEN 0 ELSE 1 END AS hit,
       |    ${mn(s"COALESCE(qtf.tf, 0) * qc.c + $mu * qctf.ctf")}
       |      - ${mn("qc.c")} - ${mn(s"qdl.dl + $mu")} AS ts
       |  FROM qdl CROSS JOIN qctf
       |  LEFT JOIN qtf ON qtf.doc_id = qdl.doc_id AND qtf.token = qctf.token
       |  CROSS JOIN qc),
       |ql AS (
       |  SELECT doc_id, CAST(SUM(hit) AS BIGINT) AS n_hit,
       |    CAST(SUM(ts) AS BIGINT) AS score_milli
       |  FROM qsc GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTE chain mirroring [[bm25]] bit-for-bit, ending in
    * `bm(doc_id, n_terms, score_u)`. Starts with `WITH` — callers
    * append their SELECT (and further CTEs after a comma). */
  def bm25CteSql(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH btok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |bdl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |bg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS total_len
       |  FROM bdl),
       |btf AS (
       |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM btok WHERE token IN ($inList) GROUP BY 1, 2),
       |bdf AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM btf GROUP BY 1),
       |bsc AS (
       |  SELECT btf.doc_id,
       |    ((CAST(FLOOR(LN(CAST(bg.n_docs + 1 AS DOUBLE)) * 1000) AS BIGINT)
       |      - CAST(FLOOR(LN(CAST(bdf.df AS DOUBLE)) * 1000) AS BIGINT))
       |     * btf.tf * 2200000)
       |    // (btf.tf * 1000 +
       |        (1200 * (250 + (750 * bdl.dl * bg.n_docs) // bg.total_len))
       |        // 1000) AS s
       |  FROM btf
       |  JOIN bdf USING (token)
       |  JOIN bdl USING (doc_id)
       |  CROSS JOIN bg),
       |bm AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    CAST(SUM(s) AS BIGINT) AS score_u
       |  FROM bsc GROUP BY doc_id)""".stripMargin
  }
}
