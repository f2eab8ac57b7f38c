package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed analogs of the partition-less `Window.orderBy(...)`
  * rank family (`percent_rank`, `ntile`, global `row_number`).
  *
  * A window with no partition key forces Spark to sort the ENTIRE
  * frame in one task — the classic single-partition scale-killer: fine
  * on an aggregated handful of rows, fatal when the frame grows with
  * the data (per-user totals, per-part scores). These helpers keep the
  * exact SQL semantics but distribute the sort:
  *
  *  1. range-bucket rows by approximate quantiles of the order key —
  *     the boundaries are a bounded driver-side list (`buckets - 1`
  *     doubles, sized by the knob, never the data), applied as a pure
  *     per-row expression;
  *  2. rank locally per bucket (`Window.partitionBy(__b)` — one hash
  *     shuffle, parallel per-bucket sorts);
  *  3. add per-bucket row-count offsets, collected driver-side (at
  *     most `buckets + 1` rows — bounded by the knob) and applied as
  *     literal expressions, so the main plan carries no extra join
  *     and no partition-less window at all.
  *
  * Correctness of the split: a bucket is a pure function of the order
  * VALUE, so a tie group can never straddle buckets and
  * `local rank + offset = global rank` exactly. Quantile placement
  * affects only balance, never results. Known limit shared with every
  * range partitioner: one hot value floods its bucket — acceptable for
  * rank inputs (aggregated frames), and strictly better than the one
  * task that a global window uses for ALL values.
  */
object Ranks {

  /** Interior quantile boundaries of `orderCol` (cast to double).
    * Driver-side result is `<= buckets - 1` doubles — bounded by the
    * knob. One aggregation pass over the (persisted) input. */
  private[functions] def boundaries(df: DataFrame, orderCol: Column,
                                    buckets: Int): Seq[Double] =
    if (buckets <= 1) Seq.empty
    else {
      val probs = (1 until buckets).map(_.toDouble / buckets).toArray
      df.select(orderCol.cast("double").as("__v"))
        .na.drop(Seq("__v"))
        .stat.approxQuantile("__v", probs, 0.01)
        .toSeq.distinct.sorted
    }

  /** Bucket id = number of boundaries strictly below the value (null
    * orders first, as SQL ASC NULLS FIRST does). Pure per-row, codegen
    * friendly. */
  private[functions] def bucketOf(orderCol: Column,
                                  bounds: Seq[Double]): Column =
    bounds.foldLeft(when(orderCol.isNull, lit(-1)).otherwise(lit(0))) {
      (acc, t) =>
        acc + when(orderCol.cast("double") > lit(t), 1).otherwise(0)
    }

  /** Core: df + `__pos` (global rank if `tieBreak` empty, else global
    * row_number over (orderCol, tieBreak)) + `__n` (total rows).
    * Callers must drop the `__`-prefixed internals.
    *
    * Cost: two bounded driver-side prep jobs (quantile boundaries,
    * per-bucket counts — each result sized by the `buckets` knob,
    * never the data) + ONE shuffle in the main query (the per-bucket
    * window). The counts become literal offset expressions, so no
    * join and no extra window appears in the plan. The input is
    * persisted (it feeds all three consumers) — what can never be
    * bought back is the single task a global window would use. */
  /** Persist-if-uncached. CACHING CONTRACT (applies to every public
    * entry point below): if the caller has not already persisted `df`,
    * it is persisted here and STAYS cached — the returned frame reads
    * it lazily, so there is no safe point inside to unpersist. Callers
    * that mind session-lifetime cache (outside the Bench/Verify
    * harness, which clearCache()s between queries) should persist the
    * input themselves and unpersist after their final action. The
    * input feeds three consumers (quantile boundaries, bucket
    * offsets, the output) — measured: q09 went 5.5s → ~2s at sf0.1. */
  private def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** Explicit cache-release hook for the persist-if-uncached contract
    * above. `cached` persists the CALLER'S input frame in place
    * (`persist` mutates and returns the same Dataset), so calling this
    * on the frame passed to percentRank / ntileGlobal / prefixSum /
    * pctRankPandas — after the final action on their result — releases
    * the blocks this module pinned. NOTE: the release is UNCONDITIONAL
    * — if the caller persisted the frame BEFORE calling the rank
    * function (so `cached` pinned nothing), this still unpersists the
    * caller's own cache; callers managing their own persist lifecycle
    * should unpersist directly instead of calling this. No-op when
    * nothing is cached, so it is always safe in a `finally`. Blocking,
    * so a long-lived session gets deterministic release rather than
    * eventual GC. */
  def release(df: DataFrame): Unit =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      df.unpersist(blocking = true)

  /** Shared offset scaffold: per-bucket aggregate `agg` (a long) is
    * collected driver-side (bounded by the `buckets` knob), prefix-
    * scanned, and folded into a literal when-chain on `__b` — so the
    * main plan carries no join and no extra window. Returns the offset
    * expression and the grand total. */
  private def bucketOffsets(withB: DataFrame,
                            agg: Column): (Column, Long) = {
    val rows: Array[(Int, Long)] = withB.groupBy(col("__b"))
      .agg(agg.as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val prefix = rows.scanLeft(0L)(_ + _._2) // mass before bucket i
    val offExpr = rows.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, ((bid, _), i)) =>
        when(col("__b") === bid, lit(prefix(i))).otherwise(acc)
    }
    (offExpr, prefix.last)
  }

  private def ranked(df: DataFrame, orderCol: Column,
                     tieBreak: Seq[Column], buckets: Int): DataFrame = {
    val in = cached(df)
    val withB = in.withColumn("__b", bucketOf(
      orderCol, boundaries(in, orderCol, buckets)))
    val (offExpr, total) = bucketOffsets(withB, count(lit(1)))
    val local = Window.partitionBy(col("__b"))
      .orderBy(orderCol +: tieBreak: _*)
    val pos = if (tieBreak.isEmpty) rank() else row_number()
    withB
      .withColumn("__pos", offExpr + pos.over(local))
      .withColumn("__n", lit(total))
  }

  private val internals = Seq("__b", "__pos", "__n")

  /** SQL `PERCENT_RANK() OVER (ORDER BY orderCol)` = (rank-1)/(n-1),
    * 0.0 for a single row — distributed. The division is the same
    * integer-operand double division both engines perform, so values
    * stay bitwise identical to the single-partition form. */
  def percentRank(df: DataFrame, orderCol: Column, as: String,
                  buckets: Int = 32): DataFrame =
    ranked(df, orderCol, Nil, buckets)
      .withColumn(as, when(col("__n") > 1,
        (col("__pos") - 1).cast("double") / (col("__n") - 1))
        .otherwise(lit(0.0)))
      .drop(internals: _*)

  /** SQL `ROW_NUMBER() OVER (ORDER BY orderCol, tieBreak)` —
    * distributed (the q163 Gini rank; any Σ f(i)·x_i order statistic).
    * `tieBreak` must make the order unique, exactly as the
    * single-partition form requires for determinism. Output column
    * `as` is the 1-based global position, long. */
  def rowNumberGlobal(df: DataFrame, orderCol: Column, tieBreak: Column,
                      as: String, buckets: Int = 32): DataFrame =
    ranked(df, orderCol, Seq(tieBreak), buckets)
      .withColumn(as, col("__pos").cast("long"))
      .drop(internals: _*)

  /** SQL `DENSE_RANK() OVER (ORDER BY orderCol)` — distributed, and
    * FUSED: unlike `rowNumberGlobal(df.select(key).distinct(), …)` +
    * join-back (the shape this replaces in the ordered suffix-rank
    * relabel), the dense label is computed on the frame in place —
    * per-bucket `dense_rank` plus cumulative per-bucket
    * DISTINCT-count offsets (a tie class never straddles buckets, so
    * local dense rank + distinct-mass-before-bucket = global dense
    * rank exactly). Saves one distinct exchange and one join-back
    * exchange per call.
    *
    * PRECONDITION: `orderCol` is null-free (`countDistinct` skips
    * nulls, so a null class would shift every later offset; the
    * suffix-rank keys are coalesced before this point). The
    * monotone-cast bucketing argument of the class doc applies
    * unchanged: equal values share a bucket, cross-bucket order is
    * preserved, in-bucket ordering uses the exact column. */
  def denseRankGlobal(df: DataFrame, orderCol: Column, as: String,
                      buckets: Int = 32): DataFrame =
    denseRankGlobalCounted(df, orderCol, as, buckets)._1

  /** [[denseRankGlobal]] returning `(frame, n_classes)` and accepting
    * caller-supplied bucket boundaries. When the caller KNOWS the key
    * distribution — the suffix-rank doubling levels pack
    * `key = r·M + r₂` with r a dense label in [1, prevClasses], so
    * uniform cuts on r are balanced by class count — passing `bounds`
    * skips the approxQuantile estimation pass entirely (one full scan
    * of the frame per call; at 100 TB, per doubling level). Boundary
    * placement affects only balance, never values (class-doc
    * argument above). `n_classes` is the exact distinct-key count,
    * free from the offsets job. */
  def denseRankGlobalCounted(df: DataFrame, orderCol: Column,
                             as: String, buckets: Int = 32,
                             bounds: Option[Seq[Double]] = None)
      : (DataFrame, Long) = {
    val in = cached(df)
    val bnds = bounds.getOrElse(boundaries(in, orderCol, buckets))
    val withB = in.withColumn("__b", bucketOf(orderCol, bnds))
    val (offExpr, total) = bucketOffsets(withB, countDistinct(orderCol))
    val local = Window.partitionBy(col("__b")).orderBy(orderCol)
    (withB
      .withColumn(as, (offExpr + dense_rank().over(local)).cast("long"))
      .drop("__b"), total)
  }

  /** SQL `NTILE(n) OVER (ORDER BY orderCol, tieBreak)` — distributed.
    * Standard semantics: with N rows, the first `N % n` tiles get
    * `floor(N/n) + 1` rows, the rest `floor(N/n)` (what Spark and
    * DuckDB both implement); `tieBreak` must make the order unique,
    * exactly as the single-partition form required for determinism. */
  def ntileGlobal(df: DataFrame, n: Int, orderCol: Column,
                  tieBreak: Column, as: String,
                  buckets: Int = 32): DataFrame = {
    val r = ranked(df, orderCol, Seq(tieBreak), buckets)
    val q = floor(col("__n") / n)
    val rem = col("__n") % n
    val cut = rem * (q + 1)
    val tile = when(col("__pos") <= cut,
      floor((col("__pos") - 1) / (q + 1)))
      .otherwise(rem + floor((col("__pos") - cut - 1) / greatest(q, lit(1L))))
    r.withColumn(as, (tile + 1).cast("int")).drop(internals: _*)
  }

  /** SQL `SUM(valueCol) OVER (ORDER BY orderCol, tieBreak ROWS
    * UNBOUNDED PRECEDING)` — the distributed global running total
    * (coverage curves, cumulative-share reports). Same bucket split as
    * the rank family, with per-bucket SUM offsets instead of counts:
    * the offsets are a bounded driver-side list (`<= buckets + 1`
    * longs), applied as literal expressions, so the plan carries ONE
    * hash shuffle (the per-bucket window) and no partition-less
    * window.
    *
    * `valueCol` is cast to long (integer cumulative sums are the
    * portable form — float running totals are order-sensitive by
    * construction); `tieBreak` must make (orderCol, tieBreak) unique,
    * exactly as the ROWS-frame window form requires for determinism.
    * Ascending NULLS FIRST order-key semantics (Spark's default); for
    * a descending curve pass the negated key. NULL values follow SQL:
    * a frame that has seen only NULL values sums to NULL (a NULL value
    * contributes nothing once a non-null appears). */
  def prefixSum(df: DataFrame, orderCol: Column, tieBreak: Column,
                valueCol: Column, as: String,
                buckets: Int = 32): DataFrame = {
    val in = cached(df)
    val withB = in
      .withColumn("__b", bucketOf(orderCol, boundaries(in, orderCol, buckets)))
      .withColumn("__v", valueCol.cast("long"))
    // an all-null bucket contributes 0 to later buckets' offsets
    val (offExpr, _) =
      bucketOffsets(withB, coalesce(sum(col("__v")), lit(0L)))
    // SQL: SUM over a frame is NULL iff the frame holds no non-null
    // value. The frame here is GLOBAL, so a row whose local bucket
    // prefix is all-null still gets the offset when any EARLIER bucket
    // held a value — track prior non-null counts the same literal way.
    val (priorNonNull, _) = bucketOffsets(withB, count(col("__v")))
    val w = Window.partitionBy(col("__b"))
      .orderBy(orderCol, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localSum = sum(col("__v")).over(w)
    withB
      .withColumn(as,
        when(localSum.isNotNull, offExpr + localSum)
          .when(priorNonNull > 0, offExpr)
          .otherwise(lit(null).cast("long")))
      .drop("__b", "__v")
  }

  /** SQL `ROW_NUMBER() OVER (PARTITION BY key ORDER BY orderCol,
    * tieBreak*)` — distributed for LOW-CARDINALITY keys. A window
    * partitioned by a handful of keys (a size-class ladder, an enum)
    * is the same scale-killer as the partition-less one — each key's
    * whole population sorts in ONE task — so the global-rank bucket
    * split applies per key: range-bucket on `orderCol` (a pure
    * per-row expression; a tie group never straddles buckets, so
    * local rank + same-key-earlier-bucket count = within-key rank
    * exactly), count per (key, bucket), prefix-scan those counts
    * within key on the BOUNDED census frame (≤ |keys|·buckets rows —
    * a trivially cheap keyed window), and broadcast-join the offsets
    * back. One hash shuffle on (key, bucket) in the main plan, sorts
    * parallel across |keys|·buckets tasks.
    *
    * CONTRACT: |keys| must be small and bounded (it sizes the offset
    * census), and (orderCol, tieBreak*) must be unique within a key
    * for a deterministic result — exactly what the single-task window
    * form requires. `orderCol` must be numeric-castable (it feeds the
    * quantile bucketer); pass a monotone numeric proxy first and the
    * true order columns in `tieBreak` when the key is a string (e.g.
    * a hex-hash prefix via conv(), then the full hash). Output column
    * `as` is the 1-based within-key position, long. */
  def rowNumberPerKey(df: DataFrame, key: Column, orderCol: Column,
                      tieBreak: Seq[Column], as: String,
                      buckets: Int = 32): DataFrame = {
    val in = cached(df)
    val withB = in
      .withColumn("__k", key)
      .withColumn("__b",
        bucketOf(orderCol, boundaries(in, orderCol, buckets)))
    val census = withB.groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val offW = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = census
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .drop("__c")
    val local = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(orderCol +: tieBreak: _*)
    withB.join(broadcast(offs), Seq("__k", "__b"))
      .withColumn(as,
        (col("__off") + row_number().over(local)).cast("long"))
      .drop("__k", "__b", "__off")
  }

  /** pandas `rank(pct=True)` (average rank / count) — distributed.
    * Average rank of a tie group = rank + (tie_count - 1)/2; the tie
    * count is a hash-partitioned window on the order value itself, so
    * no global sort appears here either. Null order values get a null
    * pct and are EXCLUDED from the denominator, exactly as pandas
    * excludes NaN — ranking them (and counting them in `n`) would
    * shift every non-null row's pct, not just the null ones. */
  def pctRankPandas(df: DataFrame, orderCol: Column, as: String,
                    buckets: Int = 32): DataFrame = {
    val nn = ranked(df.filter(orderCol.isNotNull), orderCol, Nil, buckets)
      .withColumn("__tie",
        count(lit(1)).over(Window.partitionBy(orderCol)))
      .withColumn(as,
        (col("__pos") + (col("__tie") - 1) / lit(2.0)) / col("__n"))
      .drop("__tie")
      .drop(internals: _*)
    nn.unionByName(
      df.filter(orderCol.isNull)
        .withColumn(as, lit(null).cast("double")))
  }
}
