package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Queries whose Spark side runs the STREAMING code path in batch
  * mode — Spark executes `mapGroupsWithState` on batch Datasets with
  * identical group semantics, so the driver's DuckDB oracle becomes a
  * full correctness gate for the stateful processor itself (T1/T3),
  * not just for a window-SQL restatement of it.
  */
object StreamQueries {

  /** The shared adapter key: `props.k` as a string, NULL when props
    * carries no `"k"` field. regexp_extract returns EMPTY STRING on a
    * non-match, which the oracles' TRY_CAST defines as NULL — and
    * which `cast("long")` would turn into an ANSI NumberFormatException
    * on the Spark side; nullif aligns both engines on NULL. */
  private def propsK: org.apache.spark.sql.Column =
    nullif(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1), lit(""))

  /** q83 — per-user session features through
    * [[graft.streaming.Features.userFeatures]] (the T1/T3
    * mapGroupsWithState processor) run in batch over `events`:
    * sessionization by 15-min idle gap (last session's duration and
    * event count), all-time category exploration, viewed-product
    * count, top-3 preferred categories, last-5 product sequence,
    * return-to-product flag against the 100-deep recent deque, and
    * add/remove cart membership. The adapter maps the events table
    * into the stream's Event shape (props.k → product, k%10 →
    * category, click → add_to_cart); the oracle mirrors the exact
    * fold semantics in window SQL — islands for sessions, ordered
    * row_number caps for the deque, last-action-wins for the cart.
    * Array outputs are flattened to comma-joined strings so every
    * cell is hashable (the q56 lesson).
    *
    * Scale: one shuffle on user_id (the groupByKey); per-user state is
    * bounded by the 100-event deque exactly as in the streaming
    * deployment — this is the same operator either way. */
  val q83 = QueryDef(
    "q83_session_features",
    """WITH base AS (
      |  SELECT user_id, ts,
      |    TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
      |    CASE WHEN event_type = 'click' THEN 'add_to_cart'
      |         ELSE event_type END AS etype
      |  FROM events),
      |e AS (
      |  -- order on (epoch_ms, product) EXACTLY as the operator's fold
      |  -- does (Timestamp.getTime truncates to ms) — ordering by raw
      |  -- µs ts would diverge on same-millisecond events
      |  SELECT user_id, ts, epoch_ms(ts) AS tms,
      |    CAST(k AS VARCHAR) AS product_id,
      |    'c' || CAST(k % 10 AS VARCHAR) AS category, etype,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts) DESC, CAST(k AS VARCHAR) DESC)
      |      AS rn_desc
      |  FROM base),
      |g AS (
      |  SELECT user_id, ts, tms,
      |    CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id
      |      ORDER BY tms, product_id) > 900000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |si AS (SELECT user_id, tms,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tms) AS sid FROM g),
      |sm AS (SELECT user_id, tms, sid,
      |    MAX(sid) OVER (PARTITION BY user_id) AS maxsid FROM si),
      |sess AS (
      |  SELECT user_id,
      |    (MAX(tms) - MIN(tms)) // 1000 AS session_duration_s,
      |    COUNT(*) AS events_in_session
      |  FROM sm WHERE sid = maxsid GROUP BY user_id),
      |agg AS (
      |  SELECT user_id,
      |    COUNT(DISTINCT category) AS categories_explored,
      |    COUNT(DISTINCT CASE WHEN etype = 'view' THEN product_id END)
      |      AS products_viewed_count
      |  FROM e GROUP BY user_id),
      |cats AS (SELECT user_id, category, COUNT(*) AS n FROM e GROUP BY 1, 2),
      |catsr AS (SELECT user_id, category,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, category)
      |      AS r
      |  FROM cats),
      |pref AS (SELECT user_id, string_agg(category, ',' ORDER BY r)
      |    AS preferred_categories
      |  FROM catsr WHERE r <= 3 GROUP BY user_id),
      |rec AS (SELECT user_id, string_agg(product_id, ',' ORDER BY rn_desc)
      |    AS recent_products
      |  FROM e WHERE rn_desc <= 5 GROUP BY user_id),
      |lastp AS (SELECT user_id, product_id AS last_product
      |  FROM e WHERE rn_desc = 1),
      |ret AS (
      |  SELECT e.user_id, TRUE AS is_returning
      |  FROM e JOIN lastp ON e.user_id = lastp.user_id
      |  WHERE e.rn_desc BETWEEN 2 AND 100
      |    AND e.product_id = lastp.last_product
      |  GROUP BY e.user_id),
      |ca AS (SELECT user_id, product_id, etype,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, product_id
      |      ORDER BY tms DESC) AS r
      |  FROM e WHERE etype IN ('add_to_cart', 'purchase')),
      |cart AS (SELECT user_id,
      |    CAST(COUNT(*) FILTER (WHERE etype = 'add_to_cart') AS BIGINT)
      |      AS cart_size
      |  FROM ca WHERE r = 1 GROUP BY user_id)
      |SELECT s.user_id, s.session_duration_s, s.events_in_session,
      |  a.categories_explored, a.products_viewed_count,
      |  p.preferred_categories, rc.recent_products,
      |  COALESCE(rt.is_returning, FALSE) AS is_returning_to_product,
      |  COALESCE(c.cart_size, 0) AS cart_size
      |FROM sess s
      |JOIN agg a ON s.user_id = a.user_id
      |JOIN pref p ON s.user_id = p.user_id
      |JOIN rec rc ON s.user_id = rc.user_id
      |LEFT JOIN ret rt ON s.user_id = rt.user_id
      |LEFT JOIN cart c ON s.user_id = c.user_id
      |ORDER BY s.user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val k = propsK
    val ev = Tables.events(s, d)
      .select(
        col("user_id").cast("string").as("user_id"),
        k.as("product_id"),
        concat(lit("c"), (k.cast("long") % 10).cast("string"))
          .as("category"),
        when(col("event_type") === "click", lit("add_to_cart"))
          .otherwise(col("event_type")).as("event_type"),
        coalesce(col("value").cast("double"), lit(0.0)).as("price"),
        col("ts"))
      .as[graft.streaming.Features.Event]
    graft.streaming.Features.userFeatures(ev)
      .toDF()
      .select(
        col("user_id").cast("long").as("user_id"),
        col("session_duration_s"),
        col("events_in_session"),
        col("categories_explored"),
        col("products_viewed_count"),
        array_join(col("preferred_categories"), ",")
          .as("preferred_categories"),
        array_join(col("recent_event_sequence"), ",")
          .as("recent_products"),
        col("is_returning_to_product"),
        col("cart_size"))
      .orderBy("user_id")
  }

  /** q91 — the T2 windowed product-stats processor
    * ([[graft.streaming.Features.productStats]]) run in batch: 1-hour
    * tumbling `window()` per product with view/cart/purchase counts.
    * Same adapter mapping as q83 (props.k → product, click →
    * add_to_cart); the watermark is a batch no-op. The operator's own
    * `round()`ed rate columns are replaced with exact integer ppm
    * rates computed FROM its counts (cross-engine `round(double)` is
    * not bit-portable — the q72/memory lesson), and window starts are
    * emitted as epoch seconds. One keyed shuffle on (window,
    * product); map-side combinable at any scale. */
  val q91 = QueryDef(
    "q91_product_stats",
    """WITH base AS (
      |  SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT)
      |      AS window_start_s,
      |    TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)
      |      AS k,
      |    CASE WHEN event_type = 'click' THEN 'add_to_cart'
      |         ELSE event_type END AS etype
      |  FROM events),
      |a AS (
      |  SELECT window_start_s, CAST(k AS VARCHAR) AS product_id,
      |    CAST(SUM(CASE WHEN etype = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS view_count,
      |    CAST(SUM(CASE WHEN etype = 'add_to_cart' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cart_adds,
      |    CAST(SUM(CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS purchases
      |  FROM base GROUP BY 1, 2)
      |SELECT window_start_s, product_id, view_count, cart_adds, purchases,
      |  CAST((purchases * 1000000) // GREATEST(view_count, 1) AS BIGINT)
      |    AS conv_ppm,
      |  CAST((cart_adds * 1000000) // GREATEST(view_count, 1) AS BIGINT)
      |    AS cart_ppm
      |FROM a ORDER BY window_start_s, product_id""".stripMargin) { (s, d) =>
    val k = propsK
    val ev = Tables.events(s, d).select(
      k.as("product_id"),
      when(col("event_type") === "click", lit("add_to_cart"))
        .otherwise(col("event_type")).as("event_type"),
      col("ts"))
    graft.streaming.Features.productStats(ev)
      .select(
        unix_timestamp(col("window_start")).as("window_start_s"),
        col("product_id"),
        col("view_count").cast("long").as("view_count"),
        col("cart_adds").cast("long").as("cart_adds"),
        col("purchases").cast("long").as("purchases"),
        expr("(purchases * 1000000L) div greatest(view_count, 1)")
          .as("conv_ppm"),
        expr("(cart_adds * 1000000L) div greatest(view_count, 1)")
          .as("cart_ppm"))
      .orderBy("window_start_s", "product_id")
  }

  /** q94 — the T4 sliding-window view counter
    * ([[graft.streaming.Features.rollingProductViews]]) in batch:
    * 1-hour windows sliding every 5 minutes, so each view lands in 12
    * windows (the reference's 1000-deep timestamp deque as a proper
    * windowed aggregate). The oracle expands the same 12 epoch-aligned
    * starts per event (`s0 − 300·j, j ∈ [0,12)` — exactly Spark's
    * window assignment) and re-counts. Bounded ×12 Expand + one keyed
    * shuffle; window starts emitted as epoch seconds (q72
    * discipline). */
  val q94 = QueryDef(
    "q94_rolling_views",
    """WITH base AS (
      |  SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS s0,
      |    TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)
      |      AS k
      |  FROM events WHERE event_type = 'view'),
      |x AS (
      |  SELECT CAST(k AS VARCHAR) AS product_id, s0 - 300 * j AS wstart
      |  FROM base CROSS JOIN (SELECT unnest(range(0, 12)) AS j) t)
      |SELECT wstart AS window_start_s, wstart + 3600 AS window_end_s,
      |  product_id, COUNT(*) AS views_last_hour
      |FROM x GROUP BY 1, 2, 3
      |ORDER BY window_start_s, product_id""".stripMargin) { (s, d) =>
    val k = propsK
    val ev = Tables.events(s, d).select(
      k.as("product_id"), col("event_type"), col("ts"))
    graft.streaming.Features.rollingProductViews(ev)
      .select(
        unix_timestamp(col("window_start")).as("window_start_s"),
        unix_timestamp(col("window_end")).as("window_end_s"),
        col("product_id"), col("views_last_hour"))
      .orderBy("window_start_s", "product_id")
  }

  /** q345 — incremental IVF UPSERT census
    * ([[graft.streaming.IvfUpsert]]) in batch: the newly-arrived
    * vector slice (vec_id % 5 = 0 — the q174/q302 fresh-data
    * convention) is assigned to the EXISTING coarse quantizer
    * (vec_id % 32 centroids, the q38/q344 cells) and folded through
    * the streaming `transformWithState` processor — Spark runs the v2
    * state API in batch with identical group semantics, so the DuckDB
    * oracle certifies the processor's state transition itself, the
    * q83/q91 discipline on the serving-side ANN path. Per touched
    * cell: arrival count, summed/floored-mean assignment d², the seed
    * radius (floored mean d² of the base slice, 0 for base-empty
    * cells — stated), and the q302-style retrain trigger: fresh mean
    * d² > 1.25× seed radius, exact integers (4·mean > 5·radius).
    * q302's drift monitor answers "did the codebook move"; this
    * answers "are the arrivals still well-served by the frozen
    * cells" — together they close the retrain loop.
    *
    * Scale: one broadcast-quantizer assignment pass (per-row fold —
    * no window, streaming-safe), one keyed two-long state per touched
    * cell, one |cells|-bounded join against the radius census. */
  val q345 = QueryDef(
    "q345_ivf_upsert", {
      import graft.functions.Vectors
      val dim = 64
      s"""WITH n AS (
      |  SELECT vec_id, embedding AS e,
      |    sqrt(${Vectors.dotSql("embedding", "embedding", dim)}) AS nrm
      |  FROM embeddings),
      |u AS (
      |  SELECT vec_id, t.i AS pos,
      |    CAST(FLOOR(CAST(e[t.i] AS DOUBLE)/nrm*1e6 + 0.5) AS BIGINT)
      |      AS k
      |  FROM n CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) t),
      |cent AS (SELECT vec_id AS cell, pos, k AS ck FROM u
      |         WHERE vec_id % 32 = 0),
      |ad AS (
      |  SELECT u.vec_id, c.cell,
      |    CAST(SUM((u.k - c.ck)*(u.k - c.ck)) AS BIGINT) AS d2
      |  FROM u JOIN cent c ON c.pos = u.pos GROUP BY 1, 2),
      |asn AS (
      |  SELECT vec_id, cell, d2 FROM (
      |    SELECT vec_id, cell, d2,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell)
      |        AS rc
      |    FROM ad) WHERE rc = 1),
      |rad AS (
      |  SELECT cell, CAST(SUM(d2) // COUNT(*) AS BIGINT) AS radius
      |  FROM asn WHERE vec_id % 5 <> 0 GROUP BY 1),
      |cen AS (
      |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_new,
      |    CAST(SUM(d2) AS BIGINT) AS sum_d2
      |  FROM asn WHERE vec_id % 5 = 0 GROUP BY 1)
      |SELECT c.cell, c.n_new, c.sum_d2,
      |  CAST(c.sum_d2 // c.n_new AS BIGINT) AS mean_d2,
      |  CAST(COALESCE(r.radius, 0) AS BIGINT) AS seed_radius,
      |  CAST(CASE WHEN 4 * (c.sum_d2 // c.n_new)
      |    > 5 * COALESCE(r.radius, 0) THEN 1 ELSE 0 END AS BIGINT)
      |    AS retrain
      |FROM cen c LEFT JOIN rad r ON r.cell = c.cell
      |ORDER BY c.cell""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    import graft.functions.Checkpoints
    import graft.streaming.IvfUpsert
    val ku = IvfUpsert.units(Tables.embeddings(s, d))
    val cent = ku.filter(col("vec_id") % 32 === 0)
      .select(col("vec_id").as("cell"), col("ku").as("cku"))
    // one materialized assignment pass feeds BOTH the radius census
    // and the fresh-slice fold (the q310 concurrent-subtree shape)
    val asn = Checkpoints.pin(
      IvfUpsert.assign(ku, IvfUpsert.centroidRow(cent))
        .localCheckpoint())
    val rad = asn.filter(col("vec_id") % 5 =!= 0)
      .groupBy(col("cell"))
      .agg(expr("sum(d2) div count(1)").as("radius"))
    val cen = IvfUpsert.upsert(
      asn.filter(col("vec_id") % 5 === 0)
        .select(col("cell"), col("d2")).as[IvfUpsert.VecObs])
      .toDF()
    cen.join(rad, Seq("cell"), "left")
      .select(col("cell"), col("n_new"), col("sum_d2"),
        expr("sum_d2 div n_new").as("mean_d2"),
        coalesce(col("radius"), lit(0L)).as("seed_radius"),
        when(expr("4 * (sum_d2 div n_new)")
          > lit(5L) * coalesce(col("radius"), lit(0L)), 1L)
          .otherwise(0L).as("retrain"))
      .orderBy(col("cell"))
  }

  val all: Seq[QueryDef] = Seq(q83, q91, q94, q345)
}
