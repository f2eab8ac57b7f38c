package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Exact, Text}

/** The LLM-training-data curation stages as reusable DataFrame
  * transforms over a `documents`-shaped frame (`doc_id`, `text`,
  * `source`, ...). The oracle-checked registry queries (q46 quality,
  * q48 sampling, q57 chunking, q59 chunk dedup) call these same
  * functions, so [[graft.app.CurationJob]] — the end-to-end pipeline —
  * is composed of exactly the semantics the DuckDB gate verifies.
  *
  * Every stage is shuffle-minimal by construction: dedup is one keyed
  * window, scoring/sampling/chunking are pure per-row projections (a
  * sampling decision is decidable per row in isolation — that is what
  * lets it push down to a 100-TB scan).
  */
object Curation {

  /** First 8 md5 hex digits as an unsigned 32-bit value — the
    * deterministic, engine-portable "random" driver for sampling. */
  def contentU32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Aggressive text normalization for dedup keying (the C4/RefinedWeb
    * "fuzzy exact" recipe): lowercase, strip every character outside
    * `[a-z0-9 ]`, collapse whitespace runs, trim. Dedup on the
    * normalized hash catches trivially-reformatted copies (case,
    * punctuation, spacing) that byte-exact hashing misses, at zero
    * semantic risk to the KEPT text — normalization feeds only the
    * key, never the stored document. Pure per-row projection; both
    * regex patterns are RE2-safe and replace-all on both engines
    * (the q117/q84 mirroring rule). Oracle twin: [[normalizeTextSql]]. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** DuckDB fragment computing [[normalizeText]] for expression `e`. */
  def normalizeTextSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), " +
      "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Exact content dedup, keep-first: one survivor per distinct
    * `text`, deterministically the lowest `doc_id` (a window on the
    * content hash — one shuffle; `dropDuplicates` would be
    * partition-order luck). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-document quality columns (`n_tokens`, `punct_ratio`,
    * `stop_ratio`, `quality_score`, `quality_bucket`) appended to the
    * input — the q46 scoring expression: 0.4·min(tokens/100, 1) +
    * 0.3·(1 − min(5·punct, 1)) + 0.3·min(10·stop, 1). Ratios and the
    * score go through the portable floor rounding so values are
    * engine-exact (the q20/q21 lesson). Pure per-row, staged
    * projections (no HOF re-inline). */
  def qualityScored(docs: DataFrame): DataFrame = {
    val stopwords = Text.langMarkers.head._2
    docs
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("punct_ratio", Exact.roundP(
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))) * lit(1.0)
          / greatest(length(col("text")), lit(1)), 6))
      .withColumn("stop_ratio", Exact.roundP(
        size(filter(col("toks"), x => x.isInCollection(stopwords)))
          * lit(1.0) / greatest(size(col("toks")), lit(1)), 6))
      .withColumn("__score",
        lit(0.4) * least(col("n_tokens") / lit(100.0), lit(1.0))
          + lit(0.3) * (lit(1.0) - least(col("punct_ratio") * lit(5.0), lit(1.0)))
          + lit(0.3) * least(col("stop_ratio") * lit(10.0), lit(1.0)))
      .withColumn("quality_score", Exact.roundP(col("__score"), 6))
      .withColumn("quality_bucket",
        when(col("__score") >= 0.7, "high")
          .when(col("__score") >= 0.4, "medium")
          .otherwise("low"))
      .drop("toks", "__score")
  }

  /** Deterministic stratified sampling (domain mixing): keep iff
    * u32(md5(doc_id)) mod 1000 < per-mill rate for the row's
    * `source`. No RNG state, reproducible across runs/engines/
    * partitionings; pure row-local predicate. */
  def stratifiedSample(docs: DataFrame, ratesPerMill: Map[String, Int],
                       defaultPerMill: Int): DataFrame = {
    val rate = ratesPerMill.foldLeft(lit(defaultPerMill)) {
      case (acc, (src, r)) => when(col("source") === src, r).otherwise(acc)
    }
    docs.filter(contentU32(col("doc_id")) % 1000 < rate)
  }

  /** Deterministic per-group QUOTA sampling: exactly `min(n, group
    * size)` rows per `groupCol` value, chosen by content-hash order —
    * the fixed-budget counterpart of [[stratifiedSample]]'s rates
    * (balanced domain mixing with exact per-domain counts). One keyed
    * window (shuffle on the group column); the hash order makes the
    * selection reproducible across runs, engines, and partitionings. */
  def quotaSample(docs: DataFrame, groupCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Quality-WEIGHTED sampling (importance mixing): keep a row with
    * probability `weight` (a [0,1] column — e.g. the quality score),
    * decided by the content hash so the draw is deterministic and
    * row-local like [[stratifiedSample]]. Hash uniformity gives
    * E[kept | weight=w] = w; no RNG state anywhere. The weight column
    * must be engine-exact (rounded) for oracle parity. */
  def weightedSample(docs: DataFrame, weightCol: String): DataFrame =
    docs.filter(
      (contentU32(col("doc_id")) % 1000000).cast("double") / 1000000.0
        < col(weightCol))

  /** Per-source keep-rates (ppm) that steer the corpus toward a
    * learned target mixture: given `alpha` (source, alpha_ppm — e.g.
    * [[graft.ml.Mixture.alphaRounds]]'s final round) and the current
    * per-source doc counts of `docs`, the importance ratio
    * α_d / share_d decides how much of each source survives, scaled so
    * the most-wanted source keeps everything:
    *   rate_d = floor(10⁶ · (α_d/n_d) / max_e(α_e/n_e)).
    * Exact int64 throughout (α ≤ 10⁶, the scaled quotient ≤ 10¹²).
    * Output is a |D|-row frame — broadcast it into [[mixtureSample]].
    * One keyed count agg + one scalar max; nothing scales past the
    * scan. */
  def mixtureRates(docs: DataFrame, alpha: DataFrame): DataFrame = {
    val cnt = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("__n_docs"))
    val q = alpha.join(cnt, "source")
      .select(col("source"),
        expr("alpha_ppm * 1000000L div __n_docs").as("__q"))
    val mx = q.agg(max(col("__q")).as("__mxq"))
    q.crossJoin(broadcast(mx))
      .select(col("source"),
        expr("__q * 1000000L div __mxq").as("rate_ppm"))
  }

  /** Deterministic mixture sampling: keep a doc iff its content hash
    * falls under its source's [[mixtureRates]] keep-rate. One
    * broadcast join on `source` + a row-local predicate — the
    * α-weighted counterpart of [[stratifiedSample]]'s fixed rates. */
  def mixtureSample(docs: DataFrame, rates: DataFrame): DataFrame =
    docs.join(broadcast(rates), "source")
      .filter(contentU32(col("doc_id")) % 1000000 < col("rate_ppm"))
      .drop("rate_ppm")

  /** Contribution bounding (the user-level-DP preprocessing step q306
    * censuses — Amin et al. 2019, McMahan et al. 2018), applied at the
    * document level: cap each source's contribution at `maxDocs`
    * documents (chosen in content-hash order, the [[quotaSample]]
    * discipline, so the survivors are a pure function of the corpus)
    * and clip every text at `maxChars` characters (`n_chars` is
    * recomputed from the clipped text, preserving the schema
    * invariant). Bounds each source's — and transitively each
    * upstream author's — influence on anything aggregated downstream.
    * One keyed window (shuffle on `source`) + a per-row projection. */
  def contributionBound(docs: DataFrame, maxDocs: Int,
                        maxChars: Int): DataFrame =
    quotaSample(docs, "source", maxDocs)
      .withColumn("text", substring(col("text"), 1, maxChars))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Sliding token windows of `window` tokens at `stride`: one row
    * per (doc, chunk) with a content hash for downstream chunk-level
    * dedup. Pure per-row fan-out (no shuffle). */
  def chunks(docs: DataFrame, window: Int = 64,
             stride: Int = 32): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)), lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))

  /** Cross-document chunk dedup, keep-first by (doc_id, chunk_idx):
    * the q59 window — one shuffle on the chunk hash. */
  def dedupChunks(chunkDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunkDf.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Blocklist token scrub (the C4-style bad-words filter): appends
    * `n_tokens`, `n_blocked` (tokens in the blocklist) and
    * `clean_text` (the document with blocked tokens removed) to the
    * input. Pure per-row projection — no shuffle, pushes to the scan;
    * the blocklist is compiled into the plan as an `In` literal set
    * inside a codegen'd higher-order `filter`, so corpus size is the
    * only cost driver. */
  def blocklistScrub(docs: DataFrame, blocklist: Seq[String]): DataFrame =
    docs
      .withColumn("__toks", graft.functions.Text.tokens(col("text")))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_blocked",
        size(filter(col("__toks"), t => t.isInCollection(blocklist)))
          .cast("long"))
      .withColumn("clean_text",
        array_join(
          filter(col("__toks"), t => !t.isInCollection(blocklist)), " "))
      .drop("__toks")

  /** URL canonicalization (the C4/CommonCrawl-style dedup-prep step —
    * crawls see the same page under case-varied hosts, default ports,
    * fragments, and shuffled/tracking query params):
    *
    *  1. strip the `#fragment`;
    *  2. lowercase `scheme://authority` (path case is preserved —
    *     paths are case-sensitive per RFC 3986, hosts are not);
    *  3. normalize an empty path to `/`;
    *  4. drop the scheme-default port (`http…:80`, `https…:443`) —
    *     including behind a userinfo (`u:p@host:80`) or a bracketed
    *     IPv6 literal (`[::1]:80`), via [[urlAuthorityPat]];
    *  5. drop `utm_*` tracking params, sort the rest byte-wise.
    *
    * Pure per-row projection (regex + array ops, all codegen'd) — at
    * 100 TB this rides the scan for free and feeds [[exactDedup]] on
    * the canonical form. Regexes stay RE2-compatible so the DuckDB
    * oracle (q117) mirrors them verbatim; relative URLs pass through
    * steps 2–4 unchanged (the regexes simply don't match). Known
    * lowering caveat: step 2 lowercases the whole authority including
    * any userinfo, which is case-sensitive per RFC 3986 — acceptable
    * for dedup-prep (crawl corpora don't carry credentialed URLs). */
  /** Authority sub-pattern for the default-port strip: optional
    * userinfo (`user:pass@` — may itself contain ':'), then either a
    * bracketed IPv6 literal or a reg-name/IPv4 host (no ':' / '/').
    * RE2-safe (alternation + non-capturing groups only); embedded
    * verbatim in the q117 oracle SQL so both engines strip
    * identically. */
  val urlAuthorityPat: String = "(?:[^/@]*@)?(?:\\[[^\\]/]+\\]|[^/:@]+)"

  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val lowered = concat(
      lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1)),
      regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]+", ""))
    // empty path -> '/' BEFORE the port strip, so a pathless
    // 'http://h:80' still matches the ':80/' form below
    val slashed = when(lowered.rlike("^[a-z][a-z0-9+.-]*://[^/]+$"),
      concat(lowered, lit("/"))).otherwise(lowered)
    val noPort = regexp_replace(
      regexp_replace(slashed, s"^(http://$urlAuthorityPat):80/", "$1/"),
      s"^(https://$urlAuthorityPat):443/", "$1/")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val sortedQ = array_join(sort_array(params), "&")
    when(sortedQ === "", noPort)
      .otherwise(concat(noPort, lit("?"), sortedQ))
  }

  /** Content-defined chunk list of a text column —
    * `array<struct<h: md5 hash, l: length>>`. A cut falls wherever
    * [[contentU32]] of the character 8-gram at that offset ≡ 0 mod
    * `modulus`, so boundaries follow the CONTENT: an edit changes only
    * the chunks it touches, while fixed-stride chunking
    * ([[chunks]]/q57) shifts every downstream chunk (the storage-dedup
    * property — Muthitacharoen et al., "A low-bandwidth network file
    * system", SOSP 2001). Expected chunk length = `modulus`;
    * production sizes it up (2^11 ≈ 2 KB chunks) — the boundary rule
    * stays content-local at any scale. ONE md5 per candidate offset,
    * all inside per-row HOF expressions (no shuffle); texts shorter
    * than 8 chars yield one whole-text chunk. */
  def cdcChunks(text: Column, modulus: Int = 64): Column = {
    val L = length(text).cast("int")
    val candidates = when(L >= 9, sequence(lit(1), L - 8))
      .otherwise(array().cast("array<int>"))
    val cs = filter(candidates,
      i => contentU32(text.substr(i + 1, lit(8))) % modulus === 0)
    val starts = concat(array(lit(0)), cs)
    val ends = concat(cs, array(L))
    zip_with(starts, ends, (st, en) => struct(
      md5(text.substr(st + 1, en - st)).as("h"),
      (en - st).as("l")))
  }

  /** PII redaction over a free-text column: masks email addresses and
    * US-style phone numbers with typed placeholders and counts the
    * redactions. Regexes stay in RE2-compatible territory (no
    * lookaround/backreferences) so the same patterns run on any
    * engine. Per-row projection — the 100-TB cost is one regex pass
    * per document. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Counts must agree with what the sequential replacement actually
    // does: a phone embedded in an email-shaped token (e.g.
    // "123-456-7890@x.com") is consumed by the email pass, so phones
    // are counted on the EMAIL-REDACTED text, not the original — a
    // compliance audit column that reports redactions which never
    // happened is worse than none.
    val emailScrubbed = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    docs
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailRe), lit(0)))
          .cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(emailScrubbed, lit(phoneRe), lit(0)))
          .cast("long"))
      .withColumn("redacted_text",
        regexp_replace(emailScrubbed, phoneRe, "<PHONE>"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    * hash every `k`-token gram, and in each sliding window of `w`
    * consecutive gram hashes select the minimum, rightmost position on
    * ties. Returns the DISTINCT selected `(doc_id, source, fh, fi)`
    * rows — `fh` the 32-hex md5 of the winning gram, `fi` its 1-based
    * token position.
    *
    * Guarantees (WinnowSpec pins both): every window of `w` grams
    * contributes at least one fingerprint, so any substring of
    * ≥ w+k−1 tokens shared between two documents shares at least one
    * fingerprint; expected density ≈ 2/(w+1) of the gram count.
    *
    * The rightmost-tie argmin is encoded as the plain string MIN of
    * `md5hex ∥ lpad(10⁹ − i)` — lexicographic min = (min hash, then
    * max position) identically in Spark and the DuckDB oracle, with
    * no reliance on struct-ordering or argmin window semantics.
    *
    * Scale: one corpus explode (O(tokens) rows), one per-doc window
    * (never global), output ~2/(w+1) the gram volume. */
  def winnowFingerprints(docs: DataFrame, k: Int = 5,
                         w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")
    val t = split(col("text"), " ")
    docs
      .filter(size(t) >= k)
      .select(col("doc_id"), col("source"), t.as("t"))
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), size(col("t")) - (k - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("source"), col("i").cast("long").as("i"),
        md5(array_join(slice(col("t"), col("i"), lit(k)), " ")).as("h"))
      .select(col("doc_id"), col("source"), col("i"),
        min(concat(col("h"),
          lpad((lit(1000000000L) - col("i")).cast("string"), 10, "0")))
          .over(Window.partitionBy(col("doc_id")).orderBy(col("i"))
            .rowsBetween(-(w - 1), 0)).as("wkey"))
      .filter(col("i") >= w)
      .select(col("doc_id"), col("source"), col("wkey"))
      .distinct()
      .select(col("doc_id"), col("source"),
        substring(col("wkey"), 1, 32).as("fh"),
        (lit(1000000000L) -
          substring(col("wkey"), 33, 10).cast("long")).as("fi"))
  }

  /** Boilerplate segment marking (the CCNet/RefinedWeb paragraph-dedup
    * step, Wenzek et al. 2019 §4.1, on non-overlapping `width`-token
    * segments — the paragraph stand-in for newline-free corpora): a
    * segment is boilerplate when its hash appears in ≥ `minDocs`
    * DISTINCT documents. Returns one row per segment:
    * `(doc_id, source, h, seg_len, rem)` with `rem` 1 on boilerplate.
    *
    * Scale: segmentation is row-local (slice expressions — the corpus
    * is exploded into ~n/width segments, never into tokens); the
    * census is one keyed agg on the 32-byte hash; the mark-back one
    * equi-join. Same 100-TB shape as exact dedup.
    *
    * CACHING CONTRACT (the [[graft.functions.Ranks]] discipline): the
    * internal segment frame feeds both the census and the mark-back,
    * so it is persisted here and STAYS cached — there is no safe
    * point inside to unpersist (the returned frame reads it lazily).
    * Inside the Bench/Verify harness the per-query clearCache()
    * releases it; long-lived callers should call
    * [[releaseBoilerplate]] on the RETURNED frame after their final
    * action. */
  def boilerplateSegments(docs: DataFrame, width: Int = 10,
                          minDocs: Int = 2): DataFrame = {
    require(width >= 1 && minDocs >= 2,
      s"need width >= 1, minDocs >= 2, got width=$width minDocs=$minDocs")
    val t = split(col("text"), " ")
    val segs = docs
      .filter(size(t) >= 1)
      .select(col("doc_id"), col("source"), t.as("t"),
        size(t).cast("long").as("n"))
      .select(col("doc_id"), col("source"), col("n"),
        posexplode(transform(
          sequence(lit(0), expr(s"(n + ${width - 1}) div $width") - 1),
          j => array_join(slice(col("t"),
            (j * width + 1).cast("int"), lit(width)), " "))))
      .select(col("doc_id"), col("source"), md5(col("col")).as("h"),
        least(lit(width.toLong),
          col("n") - col("pos") * width.toLong).as("seg_len"))
      .persist()
    val boiler = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"), lit(1L).as("rem"))
    pinnedSegs.add(segs)
    segs.join(boiler, Seq("h"), "left_outer")
      .select(col("doc_id"), col("source"), col("h"), col("seg_len"),
        coalesce(col("rem"), lit(0L)).as("rem"))
  }

  /** Frames [[boilerplateSegments]] pinned (see its caching contract). */
  private val pinnedSegs =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Release every segment frame [[boilerplateSegments]] has pinned so
    * far. Call after the final action on the returned frame(s); later
    * actions on those frames recompute the segments instead of
    * reading cache (correct, just slower). No-op when nothing is
    * pinned — always safe in a `finally`. */
  def releaseBoilerplate(): Unit = {
    var f = pinnedSegs.poll()
    while (f != null) { f.unpersist(blocking = true); f = pinnedSegs.poll() }
  }
}
