package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Count-based bigram language-model scoring — the classic statistical
  * quality-filter signal (CCNet/KenLM-style perplexity filtering, here
  * from exact corpus counts instead of a trained binary model): train
  * bigram counts with add-one smoothing on one slice, score another
  * slice's documents by per-token negative log-likelihood.
  *
  * NLL(doc) = Σ over its bigrams of ln(c(x)+V) − ln(c(xy)+1), where
  * c(x) is the training context count, c(xy) the training bigram
  * count, and V the training vocabulary size — add-one smoothing
  * P(y|x) = (c(xy)+1)/(c(x)+V), degrading to uniform 1/V on unseen
  * contexts.
  *
  * Portability (the q77 concern: JVM `Math.log` vs DuckDB libm agree
  * to ~1 ulp, not bit-for-bit): every ln is taken of an INTEGER-valued
  * double and immediately floor-quantized to the milli-nat grid
  * ([[mnat]]); all downstream arithmetic — per-bigram difference,
  * per-doc sum, integer div for the mean — is exact on longs. A grid
  * flip needs 1000·ln(k) within ~2e-12 of an integer for some count
  * value k actually present; with a few 10⁴ distinct counts per corpus
  * that is ~1e-7 aggregate risk (vs compounding per-row float error in
  * the naive form). ln(1) = 0 exactly on both engines, covering the
  * unseen-bigram floor.
  *
  * Scale shape (the q101 contract): tokenize once, persist the
  * (doc, x, y) bigram frame for its three consumers (bigram census,
  * context census, eval probe); both censuses are map-side-combined
  * keyed aggs; the probe is two equi-joins on the bigram/context key
  * (AQE broadcasts the count side while the vocabulary is small — it
  * grows by Heaps' law, so no unconditional hint); V rides a broadcast
  * one-row cross join. No window, no driver state. At 100 TB the count
  * tables are the only intermediates growing with corpus diversity —
  * the same count-min/bloom compression candidates as q101's df table.
  */
object LangModel {

  /** floor(1000·ln(k)) as a long — the milli-nat quantizer. `k` must
    * be an integer-valued positive column. */
  def mnat(k: Column): Column =
    floor(log(k.cast("double")) * 1000).cast("long")

  /** [[mnat]] as DuckDB SQL over an integer-valued expression — the
    * oracle-side half of the quantizer contract. */
  def mnatSql(e: String): String =
    s"CAST(FLOOR(LN(CAST(($e) AS DOUBLE)) * 1000) AS BIGINT)"

  /** Binary multinomial Naive Bayes with add-one smoothing — the
    * fastText-style document classifier whose TRAINING is itself
    * oracle-expressible (pure count arithmetic), unlike the
    * gradient-trained models (q43/q45) that stay rows-only: trains on
    * the `!isEval` slice, scores each eval document's log-likelihood
    * ratio in milli-nats.
    *
    * llr(doc) = [mnat(d0) − mnat(d1)]                       (prior)
    *          + Σ_tokens [mnat(c_t0+1) − mnat(n0+V)]
    *                    − [mnat(c_t1+1) − mnat(n1+V)]        (evidence)
    * where c_tc = training count of token t under class c, n_c = total
    * training tokens of class c, d_c = training docs of class c, V =
    * training vocabulary size. pred = 0 iff llr ≥ 0 (tie → class 0,
    * deterministic). Every ln rides the [[mnat]] grid — the q130
    * portability argument; all sums are exact on longs.
    *
    * Precondition: both classes non-empty in the training slice
    * (mnat(0) is undefined).
    *
    * Scale shape: tokenize once (persisted for the train/eval
    * consumers); the class-conditional count table is ONE keyed agg
    * (vocabulary-sized, the q130/q101 count-table compression
    * candidate); totals and priors ride broadcast one-row frames; the
    * eval probe is one equi-join on token. No window, no driver
    * state.
    *
    * Output: (doc_id, label, llr_mnat, pred), one row per eval doc,
    * unordered. */
  def nbLlr(docs: DataFrame, label: Column, isEval: Column): DataFrame = {
    def cnt(l: Int, as: String) =
      sum(when(col("label") === l, 1L).otherwise(0L)).as(as)
    val base = docs.select(col("doc_id"), label.cast("long").as("label"),
      isEval.as("__eval"), col("text"))
    val tok = base.select(col("doc_id"), col("label"), col("__eval"),
        explode(split(col("text"), " ")).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tr = tok.filter(!col("__eval"))
    val cw = tr.groupBy(col("t")).agg(cnt(0, "c0"), cnt(1, "c1"))
    val tot = tr.agg(cnt(0, "n0"), cnt(1, "n1"),
      countDistinct(col("t")).as("v"))
    val dc = base.filter(!col("__eval")).agg(cnt(0, "d0"), cnt(1, "d1"))
    tok.filter(col("__eval"))
      .join(cw, Seq("t"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("label"),
        ((mnat(coalesce(col("c0"), lit(0L)) + 1)
          - mnat(col("n0") + col("v")))
          - (mnat(coalesce(col("c1"), lit(0L)) + 1)
            - mnat(col("n1") + col("v")))).as("td"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("td")).as("std"))
      .crossJoin(broadcast(dc))
      .select(col("doc_id"), col("label"),
        (col("std") + mnat(col("d0")) - mnat(col("d1"))).as("llr_mnat"))
      .withColumn("pred", when(col("llr_mnat") >= 0, 0L).otherwise(1L))
  }

  /** The scoring pass alone, against SUPPLIED model tables: `evalBg`
    * (doc_id, x, y), `cxy` (x, y, cxy), `cx` (x, cx), and a one-row
    * `v` (v) — the seam that lets q141 score with INCREMENTALLY
    * MERGED count tables and prove equality to the one-shot model.
    * Output: (doc_id, n_bigrams, nll_mnat, avg_mnat), unordered. */
  def scoreWith(evalBg: DataFrame, cxy: DataFrame, cx: DataFrame,
                v: DataFrame): DataFrame =
    evalBg
      .join(cxy, Seq("x", "y"), "left")
      .join(cx, Seq("x"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (mnat(coalesce(col("cx"), lit(0L)) + col("v"))
          - mnat(coalesce(col("cxy"), lit(0L)) + 1)).as("mnat"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("mnat")).as("nll_mnat"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_mnat"),
        expr("nll_mnat div n_bigrams").as("avg_mnat"))

  /** The tokenize-once bigram frame (doc_id, __eval, x, y),
    * persisted for its multiple consumers. */
  def bigramFrame(docs: DataFrame, isEval: Column): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"),
        isEval.as("__eval"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("__eval"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"), col("__eval"),
        expr("element_at(toks, i)").as("x"),
        expr("element_at(toks, i + 1)").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Per-document NLL scores for documents matching `isEval`, from a
    * bigram LM trained on the complement. `docs` must carry `doc_id`
    * and a string `text`; tokens are whitespace-split (the q101/q102
    * treatment). Output: (doc_id, n_bigrams, nll_mnat, avg_mnat), one
    * row per eval document with ≥ 2 tokens, unordered. */
  def bigramNllScores(docs: DataFrame, isEval: Column): DataFrame = {
    val bg = bigramFrame(docs, isEval)
    val train = bg.filter(!col("__eval"))
    val cxy = train.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cxy"))
    val cx = train.groupBy(col("x")).agg(count(lit(1)).as("cx"))
    val v = docs.filter(!isEval)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    scoreWith(bg.filter(col("__eval")).select("doc_id", "x", "y"),
      cxy, cx, v)
  }
}
