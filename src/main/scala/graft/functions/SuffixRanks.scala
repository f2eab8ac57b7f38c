package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-prefix ranks via prefix doubling (Manber–Myers),
  * the backbone of exact substring deduplication over a corpus (the
  * suffix-array dedup of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better" — the true form that the bounded
  * dup-span queries q104/q137 approximate).
  *
  * Semantics: after `ranks(docs, L)`, two character positions carry
  * the SAME rank iff the length-L prefixes of their suffixes
  * (truncated at their document's end) are EQUAL as strings.
  * Documents are never concatenated — position (doc, i) pairs keep
  * doc identity, so no phantom substrings span document boundaries.
  *
  * Cost shape. The base step ranks b-character blocks directly by
  * positional packing in base (maxCode+2) — b auto-sized from the
  * observed alphabet so the packed key fits a long (ASCII → b = 8) —
  * which removes log₂ b doubling rounds outright; the remaining
  * log₂ (L/b) rounds each do:
  *   1. self-join on (doc, i+k) — ONE hash shuffle — pairing each
  *      position's rank with its k-successor's (0 past doc end);
  *   2. relabel each distinct (r, r₂) class. Dedup needs only
  *      EQUALITY-preserving labels, so the label is `min(pos)` over
  *      the class (pos = global 1-based character offset) computed as
  *      ONE hash-partitioned window — classes partition positions, so
  *      minima over disjoint sets are automatically distinct, and no
  *      global sort or join-back shuffle appears at all. With
  *      `ordered = true` the label is instead the distributed dense
  *      rank ([[Ranks.rowNumberGlobal]] + join-back) and rank ORDER
  *      equals lexicographic prefix order — the suffix-ARRAY variant
  *      (both the base packing and the pair key are order-preserving).
  * Every stage keys on data columns (doc, i, packed rank) and the
  * shuffled payload is 8-byte longs, never gram strings — the reason
  * this survives 100 TB where the naive substring group-by (the
  * oracle's shape) shuffles |corpus|·L bytes. Each round ends in an
  * EAGER localCheckpoint (the Components discipline) — without it the
  * nested self-join lineage grows exponentially with round count and
  * Catalyst analysis alone dominates the wall clock.
  *
  * Rank packing: pair keys are r·2³¹ + r₂, exact in a long for up to
  * 2³¹ positions (~2 G chars per job slice). Beyond that, shard the
  * corpus or swap the packed long for a two-column sort key — the
  * relabeling is value-pure either way.
  *
  * Degenerate-corpus precondition (the PageRank dangling-node style
  * note): the min(pos) relabel window partitions by rank CLASS, so
  * its parallelism is the number of distinct classes at each round.
  * A pathological corpus — e.g. one character repeated corpus-wide —
  * has O(L) classes total, collapsing most positions into one class
  * and therefore ONE window task. Results stay CORRECT (pinned by
  * SuffixRanksSpec's degenerate fixture); only parallelism degrades,
  * and only in proportion to how much of the corpus is one repeated
  * run. Realistic corpora (even heavily templated ones) have class
  * counts within a small factor of position counts by round two. A
  * corpus known to be run-dominated should be pre-collapsed
  * (run-length dedup) before ranking — cheaper than salting every
  * round for a case exact-substring dedup makes trivial anyway.
  */
object SuffixRanks {

  private val M = 1L << 31

  /** Unpersist every checkpointed rank frame produced since the last
    * call (every level is an eager localCheckpoint — RDD-level
    * persists that `spark.catalog.clearCache()` does NOT track or
    * free; see [[Checkpoints]]). Call after the final action on
    * frames derived from [[ranks]]/[[rankLevels]]; later actions on
    * those frames FAIL (no lineage to recompute) — this is a release,
    * not a cache spill. Delegates to the shared registry the harness
    * drains per query. */
  def release(): Unit = Checkpoints.releaseAll()

  private def powL(base: Long, e: Int): Long = {
    var v = 1L; var i = 0
    while (i < e) { v *= base; i += 1 }
    v
  }

  /** `docs`: one row per document — (doc long, text string). Returns
    * (doc, i, r) — one row per character position, i 0-based — with
    * the equal-rank ⟺ equal-L-prefix property above. The result is an
    * eager localCheckpoint (materialized, lineage-free). Checkpoint
    * blocks are RDD-level persists that `spark.catalog.clearCache()`
    * does NOT free — callers must call [[release]] after their final
    * action (the Bench/Verify harness does so per query). */
  def ranks(docs: DataFrame, L: Int, ordered: Boolean = false,
            buckets: Int = 32, wideBase: Boolean = false): DataFrame = {
    val levels = rankLevels(docs, L, ordered, buckets, wideBase)
    levels.init.foreach(l => Checkpoints.free(l._2)) // keep only level L
    levels.last._2.select(col("doc"), col("i"), col("r"))
  }

  /** Every intermediate rank level the doubling pass produces on its
    * way to L — `(k, frame)` for k = b, 2b, …, L, each frame
    * (doc, i, pos, r) CHECKPOINTED with the equal-rank ⟺
    * equal-k-prefix property. The levels come FREE from the single
    * prefix-doubling run (the loop passes through each k), which is
    * what makes a duplication-length SPECTRUM one run instead of
    * log L separate ones. All frames stay live; callers unpersist
    * the ones they drop. */
  /** `wideBase = true` packs TWO longs of block digits at the base
    * step (2b characters, e.g. 16 for ASCII instead of 8), removing
    * one full doubling round — one fewer full-corpus shuffle+sort+
    * checkpoint pass (round-12 phase 3). Only for callers that
    * consume the FINAL level: the level ladder then starts at 2b, so
    * spectrum/lifting consumers that read intermediate levels
    * (q178/q353) must keep the narrow base. Label semantics at every
    * produced level are identical to the narrow path (the two-long
    * key (kh, kl) orders and equates exactly like the one 2b-digit
    * number it represents). */
  def rankLevels(docs: DataFrame, L: Int, ordered: Boolean = false,
                 buckets: Int = 32,
                 wideBase: Boolean = false): Seq[(Int, DataFrame)] = {
    require(L >= 2 && (L & (L - 1)) == 0, s"L must be a power of two, got $L")
    // BYTE-level positions: `substr` on a STRING column is O(i) (it
    // must scan for UTF-8 char boundaries), which makes per-position
    // extraction O(len²) per document — measured as ~90% of the
    // operator's wall clock at sf0.1. `substr` on a BINARY column is
    // byte-indexed O(1), so every position probe below runs on the
    // encoded bytes. For ASCII corpora byte ranks ≡ char ranks; for
    // multibyte UTF-8 the dedup is over byte L-grams (well-defined,
    // equal byte prefixes ⟺ equal encoded text).
    // Fan the docs out by doc id BEFORE the per-position explode (the
    // q221 repartition-before-the-blowup rule): the corpus arrives as
    // a couple of parquet splits, so without this the explode + byte
    // decode + block-key assembly run on those few cores. Keying the
    // fan-out by doc means the doc-partitioned windows below reuse
    // this exchange — no extra shuffle appears, the blowup just runs
    // at full width (width = session shuffle parallelism, Par.fanout).
    import graft.functions.Par.FanoutOps
    val raw = docs.select(col("doc").cast("long").as("doc"),
        encode(col("text"), "UTF-8").as("bin"))
      .withColumn("len", length(col("bin")).cast("long"))
      .filter(col("len") > 0)
    val base = raw.fanoutBy(col("doc"))
    // Global 1-based position id (the class-representative pool):
    // doc-offset prefix sum + in-doc index. One row per doc; the
    // prefix sum distributes via Ranks.
    def probed[T](name: String)(f: => T): T =
      if (sys.env.contains("SPARK_GRAFT_RANK_PROBE")) {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"[rankprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
        r
      } else f
    // lens and the alphabet probe read the FANNED frame: the docs
    // parquet arrives as one split, and the per-doc byte fold in the
    // alphabet probe is a blowup (n bytes of work from |docs| rows) —
    // without the fan-out it runs on one core (measured 0.7s → 3.1s)
    val lens = base.select(col("doc"), col("len"))
    val off = probed("off prefixSum")(
      Ranks.prefixSum(lens, col("doc"), col("doc"), col("len"), "cum")
        .select(col("doc"), (col("cum") - col("len")).as("off")))
    def byteAt(offset: Int): org.apache.spark.sql.Column =
      expr(s"ascii(decode(substr(bin, cast(i as int) + ${offset + 1}, 1), 'ISO-8859-1'))")
    val chars = base.join(off, Seq("doc"))
      .select(col("doc"), col("bin"), col("len"), col("off"),
        explode(sequence(lit(0L), col("len") - 1)).as("i"))
    // alphabet probe: max byte code per DOC via a fold over the
    // binary, then max over docs — value-identical to probing every
    // exploded position (same byte set) but it never materializes the
    // per-position frame, so the explode+decode pass runs once (for
    // `keyed` below), not twice (round-12 phase 2; measured ~2s per
    // suffix query at sf0.1). Digits are code+1 so the off-end
    // sentinel 0 sorts below every real byte.
    val maxCode = probed("maxCode probe")(base.select(expr(
        "aggregate(sequence(1, cast(len as int)), 0, (acc, j) -> " +
          "greatest(acc, ascii(decode(substr(bin, j, 1), 'ISO-8859-1'))))")
        .as("m"))
      .agg(max(col("m"))).head().getInt(0))
    val radix = maxCode.toLong + 2
    // largest power-of-two block with radix^b <= 2^62, capped at L
    var b = 1
    while (b * 2 <= L && BigInt(radix).pow(b * 2) <= (BigInt(1) << 62))
      b *= 2
    // wide base: 2b digits across TWO packed longs (kh, kl) — orders
    // and equates exactly like the one 2b-digit number, so the base
    // level IS level 2b and one doubling round disappears
    val wide = wideBase && b * 2 <= L
    // ONE byte extraction per position; the other block digits come
    // from lead() over a doc-keyed window — one sort per doc, frame
    // reads instead of decode calls per row (measured ~3x on the base
    // step). lead past the doc end is null → digit 0, the same
    // off-end sentinel as the doubling rounds.
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
    def digit(j: Int): org.apache.spark.sql.Column =
      if (j == 0) (col("c") + 1).cast("long")
      else (coalesce(lead(col("c"), j).over(wDoc), lit(-1)) + 1).cast("long")
    def packed(lo: Int, hi: Int): org.apache.spark.sql.Column =
      (lo until hi).map(j => digit(j) * lit(powL(radix, hi - 1 - j)))
        .reduce(_ + _)
    val baseCols =
      if (wide) Seq(packed(0, b).as("kh"), packed(b, 2 * b).as("kl"))
      else Seq(packed(0, b).as("key"))
    val baseKeys = if (wide) Seq("kh", "kl") else Seq("key")
    val keyed = probed("base keys ckpt")(chars
      .select(col("doc"), col("i"), (col("off") + col("i") + 1).as("pos"),
        byteAt(0).as("c"))
      .select(Seq(col("doc"), col("i"), col("pos")) ++ baseCols: _*)
      .localCheckpoint()) // eager: truncate lineage at the source
    Checkpoints.pin(keyed)
    val n = probed("keyed count")(keyed.count())
    require(n < M, s"$n positions exceeds the packed-rank capacity $M; shard the corpus")
    // Relabel = ONE hash-partitioned window per step (min(pos) over
    // the key class) for the dedup variant — no global sort, no
    // join-back shuffle. The ordered variant pays the extra dense-rank
    // machinery (distinct + distributed row number + join) to make
    // label ORDER lexicographic.
    // Ordered relabels thread the exact class count forward: level
    // 2k's keys are r·M + r₂ with r dense in [1, nClasses], so
    // uniform cuts on r are balanced by class count and the per-level
    // approxQuantile estimation pass is skipped (base level still
    // probes quantiles — byte distributions are genuinely skewed).
    var nClasses = 0L
    def relabel(frame: DataFrame,
                bounds: Option[Seq[Double]] = None,
                keyCols: Seq[String] = Seq("key")): DataFrame =
      if (ordered) {
        // fused distributed dense rank, ONE pass over the frame
        // (round-12 phase 2): the per-bucket dense_rank is
        // materialized as this level's eager checkpoint DIRECTLY, and
        // the cumulative per-bucket offsets are read back from the
        // MATERIALIZED checkpoint (max local rank per bucket ≡
        // countDistinct per bucket; ≤ `buckets` rows driver-side) and
        // applied as a literal when-chain in a lazy projection. The
        // previous shape (Ranks.denseRankGlobalCounted) paid a
        // separate countDistinct pre-pass plus a full cache
        // write+read of the paired frame per level; labels are
        // value-identical (local dense rank + distinct-mass-before-
        // bucket = global dense rank — a tie class never straddles
        // buckets, the class-doc argument).
        // buckets cut on the FIRST key column (a tie class has equal
        // full keys, hence an equal first column — never straddles)
        val bnds = bounds.getOrElse(
          Ranks.boundaries(frame, col(keyCols.head), buckets))
        val local = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__b")).orderBy(keyCols.map(col): _*)
        val ck = Checkpoints.pin(frame
          .withColumn("__b", Ranks.bucketOf(col(keyCols.head), bnds))
          .withColumn("__lr", dense_rank().over(local).cast("long"))
          .select(col("doc"), col("i"), col("pos"), col("__b"),
            col("__lr"))
          .localCheckpoint())
        val maxima = ck.groupBy(col("__b"))
          .agg(max(col("__lr")).as("m")).collect()
          .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val prefix = maxima.scanLeft(0L)(_ + _._2)
        val offExpr = maxima.zipWithIndex.foldLeft(lit(0L)) {
          case (acc, ((bid, _), ix)) =>
            when(col("__b") === bid, lit(prefix(ix))).otherwise(acc)
        }
        nClasses = prefix.last
        ck.select(col("doc"), col("i"), col("pos"),
          (col("__lr") + offExpr).as("r"))
      } else frame
        .withColumn("nr", min(col("pos")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)))
        .select(col("doc"), col("i"), col("pos"), col("nr").as("r"))
    def levelBounds: Option[Seq[Double]] =
      if (!ordered || nClasses <= 0) None
      else Some((1 until buckets)
        .map(j => (j.toDouble * nClasses / buckets) * M.toDouble)
        .distinct.sorted)
    // ordered relabels checkpoint INSIDE relabel (the offsets job must
    // read the materialized frame); the dedup relabel stays lazy and
    // is checkpointed here.
    def materialized(r: DataFrame): DataFrame =
      if (ordered) r else Checkpoints.pin(r.localCheckpoint())
    val b0 = if (wide) 2 * b else b
    var p = probed(s"relabel base b=$b0")(
      materialized(relabel(keyed, keyCols = baseKeys)))
    Checkpoints.free(keyed) // base keys never read again past level b0
    var k = b0
    val levels = scala.collection.mutable.ArrayBuffer(k -> p)
    while (k < L) {
      // k-successor rank via lead(r, k) over the doc-keyed position
      // window (round-12): position rows are CONSECUTIVE integers
      // 0..len-1 within each doc by construction (the explode above;
      // nothing is filtered before this point), so the row k ahead IS
      // position i+k and lead-past-doc-end is null → sentinel 0 —
      // exactly the (doc, i+k) self-join this replaces, minus both of
      // the join's hash exchanges (ONE doc-keyed sort instead; the
      // same trick the base step uses for its block digits).
      val wDocK = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc")).orderBy(col("i"))
      val paired = p.withColumn("key",
        col("r") * M + coalesce(lead(col("r"), k).over(wDocK), lit(0L)))
      val bnds = levelBounds // from the PREVIOUS level's class count
      val next = probed(s"relabel level ${k * 2}")(
        materialized(relabel(paired, bnds)))
      p = next
      k *= 2
      levels += k -> p
    }
    levels.toSeq
  }
}
