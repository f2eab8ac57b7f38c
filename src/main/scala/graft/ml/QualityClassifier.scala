package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Checkpoints

/** The learned document-quality filter of GPT-3's pipeline (Brown et
  * al. 2020 App. A) and CCNet (Wenzek et al. 2020) as an exact-integer
  * Spark operator: a linear scorer over fixed per-row features,
  * trained by unrolled full-batch gradient descent with the
  * hard-sigmoid link σ̂(t) = clip(t/4 + 1/2, 0, 1) (Courbariaux et al.
  * 2015) so every quantity is rational on the ppm grid — the SAME
  * arithmetic q303 gates against the DuckDB oracle
  * (TrainQueries.q303 is a thin wrapper over this object; the
  * reference's own quality scorer is per-record arithmetic,
  * processing/utils/data_quality.py:560).
  *
  * Scale: [[featurize]] and [[gate]] are pure per-row projections (no
  * shuffle); each training step is one broadcast of the 1×4 weight row
  * + one map-side-combinable 4-column sum — `steps` linear passes
  * total, exactly how a full-batch linear probe trains on 100 TB.
  */
object QualityClassifier {

  /** Sign-safe floor division on pure int64: pmod-corrected numerator
    * (an exact multiple of b), then the integral `div` —
    * `Column.divide` promotes to double and goes off by one past 2^53
    * (the Intervals.floorDiv hazard). */
  private def fdCol(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** Fixed featurizer: near-zero-centered integer features on declared
    * grids (centering constants are part of the spec, like Buckets'
    * cut points — NOT data-derived, so this is a pure per-row
    * projection at any scale).
    *   x0 bias=10; x1 = n_tokens−50; x2 = centi-mean-token-len−550;
    *   x3 = 10·stopword_count−30; label y = [lang = 'en'].
    * Input needs `text`, `n_chars`, `lang`; passthrough keeps the
    * caller's other columns (doc_id, source, ...) so [[gate]] can
    * filter in place. */
  def featurize(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
      .withColumn("x0", lit(10L))
      .withColumn("x1", (size(toks) - 50).cast("long"))
      .withColumn("x2",
        (expr("(100 * n_chars) div size(split(text, ' '))") - 550)
          .cast("long"))
      .withColumn("x3",
        (size(filter(toks, t => t.isin("the", "a", "of", "and"))) * 10
          - 30).cast("long"))
  }

  /** Unrolled full-batch GD census: per step, the weight vector, the
    * positive-prediction count, and the training accuracy (ppm) —
    *   w_j ← w_j − floor(Σ_i err_i·x_ij / (N·1000)),
    *   err_i = σ̂_ppm(Σ_j w_j·x_ij) − 10⁶·y_i.
    * `feat` must carry y, x0..x3 (from [[featurize]]). The featurized
    * frame is eagerly checkpoint-pinned (each step's gradient agg and
    * accuracy frame read it from concurrent broadcast subtrees — the
    * measured cache race; see Checkpoints), so callers should release
    * pins after their final action. Output: `steps` rows
    * (step, w0..w3, n_pred_pos, acc_ppm). */
  def trainCensus(feat0: DataFrame, steps: Int = 3): DataFrame = {
    val feat = Checkpoints.pin(
      feat0.select("y", "x0", "x1", "x2", "x3").localCheckpoint())
    // The 1-row count and per-step weight frames are eagerly
    // checkpointed too (pennies: one row each). Without this every
    // broadcast(w_i) subtree re-runs the WHOLE chain up to step i —
    // O(steps²) passes inside training and one more full chain per
    // downstream consumer — and, worse, each consumer's plan inlines
    // the unrolled chain, producing the giant Janino classes behind
    // the measured JIT-compile storms on the q303-family queries
    // (round-1 mechanism; round-10 suspects q333/q310). Checkpointed,
    // every step and every consumer compiles one SMALL reused unit
    // and the chain executes exactly once per step.
    val nRow = Checkpoints.pin(
      feat.agg(count(lit(1)).as("n")).localCheckpoint())
    val s = feat.sparkSession
    var w: DataFrame = s.range(1)
      .select(lit(0L).as("w0"), lit(0L).as("w1"),
        lit(0L).as("w2"), lit(0L).as("w3"))
    val accs = (1 to steps).map { i =>
      val e = feat.crossJoin(broadcast(w)).crossJoin(broadcast(nRow))
        .withColumn("err",
          least(lit(1000000L),
            greatest(lit(0L), expr(
              "(x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4")))
            - col("y") * 1000000L)
      w = e.agg(
        (max(col("w0")) - fdCol(sum(col("err") * col("x0")),
          max(col("n")) * 1000L)).as("w0"),
        (max(col("w1")) - fdCol(sum(col("err") * col("x1")),
          max(col("n")) * 1000L)).as("w1"),
        (max(col("w2")) - fdCol(sum(col("err") * col("x2")),
          max(col("n")) * 1000L)).as("w2"),
        (max(col("w3")) - fdCol(sum(col("err") * col("x3")),
          max(col("n")) * 1000L)).as("w3"))
      w = Checkpoints.pin(w.localCheckpoint())
      val hit = when(expr("x0*w0 + x1*w1 + x2*w2 + x3*w3") > 0, 1L)
        .otherwise(0L)
      feat.crossJoin(broadcast(w)).crossJoin(broadcast(nRow))
        .agg(
          max(col("w0")).as("w0"), max(col("w1")).as("w1"),
          max(col("w2")).as("w2"), max(col("w3")).as("w3"),
          sum(hit).as("n_pred_pos"),
          (sum(when(hit === col("y"), 1L).otherwise(0L)) * 1000000L)
            .as("__correct_scaled"),
          max(col("n")).as("__n"))
        .select(lit(i.toLong).as("step"), col("w0"), col("w1"),
          col("w2"), col("w3"), col("n_pred_pos"),
          expr("__correct_scaled div __n").as("acc_ppm"))
    }
    accs.reduce(_ unionByName _).orderBy("step")
  }

  /** Per-(doc, step) training errors of the SAME GD run as
    * [[trainCensus]] — err_i under checkpoint w_{i−1}, the quantity
    * TracIn-style influence rides (for the linear scorer the per-doc
    * gradient is err·x, so influence products reduce to err arithmetic
    * times feature dot products). Identical weight-update arithmetic;
    * output (doc_id, y, step, err), `steps`·n rows. */
  def stepErrors(feat0: DataFrame, steps: Int = 3): DataFrame = {
    val feat = Checkpoints.pin(
      feat0.select("doc_id", "y", "x0", "x1", "x2", "x3")
        .localCheckpoint())
    // Same per-step checkpoint discipline as [[trainCensus]] — see
    // the rationale there (chain re-execution + JIT-storm codegen).
    val nRow = Checkpoints.pin(
      feat.agg(count(lit(1)).as("n")).localCheckpoint())
    val s = feat.sparkSession
    var w: DataFrame = s.range(1)
      .select(lit(0L).as("w0"), lit(0L).as("w1"),
        lit(0L).as("w2"), lit(0L).as("w3"))
    val es = (1 to steps).map { i =>
      val e = feat.crossJoin(broadcast(w)).crossJoin(broadcast(nRow))
        .withColumn("err",
          least(lit(1000000L),
            greatest(lit(0L), expr(
              "(x0*w0 + x1*w1 + x2*w2 + x3*w3 + 2000000) div 4")))
            - col("y") * 1000000L)
      w = e.agg(
        (max(col("w0")) - fdCol(sum(col("err") * col("x0")),
          max(col("n")) * 1000L)).as("w0"),
        (max(col("w1")) - fdCol(sum(col("err") * col("x1")),
          max(col("n")) * 1000L)).as("w1"),
        (max(col("w2")) - fdCol(sum(col("err") * col("x2")),
          max(col("n")) * 1000L)).as("w2"),
        (max(col("w3")) - fdCol(sum(col("err") * col("x3")),
          max(col("n")) * 1000L)).as("w3"))
      w = Checkpoints.pin(w.localCheckpoint())
      e.select(col("doc_id"), col("y"), lit(i.toLong).as("step"),
        col("err"))
    }
    es.reduce(_ unionByName _)
  }

  /** The final weight row (w0..w3) of a [[trainCensus]] frame. */
  def weights(census: DataFrame, steps: Int = 3): DataFrame =
    census.filter(col("step") === steps.toLong)
      .select("w0", "w1", "w2", "w3")

  /** The learned gate: keep documents the classifier scores positive
    * (z = Σ w_j·x_j > 0). One broadcast of the 1×4 weight row against
    * a per-row projection — no shuffle, no join key; the caller's
    * columns pass through unchanged. */
  def gate(docs: DataFrame, w: DataFrame): DataFrame =
    featurize(docs).crossJoin(broadcast(w))
      .filter(expr("x0*w0 + x1*w1 + x2*w2 + x3*w3") > 0)
      .drop("y", "x0", "x1", "x2", "x3", "w0", "w1", "w2", "w3")
}
