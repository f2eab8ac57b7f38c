package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Features
import graft.streaming.Features.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2025-09-05 12:$min%02d:$sec%02d")

  private val events = Seq(
    Event("u1", "A", "electronics", "view", 10.0, ts(0)),
    Event("u1", "B", "books", "view", 5.0, ts(1)),
    Event("u1", "A", "electronics", "add_to_cart", 10.0, ts(2)),
    Event("u1", "A", "electronics", "purchase", 10.0, ts(3)),
    Event("u2", "C", "books", "view", 7.0, ts(1, 30)))

  test("userFeatures stateful session logic (batch-mode semantics)") {
    val got = Features.userFeatures(events.toDS()).collect()
      .map(f => f.user_id -> f).toMap
    val u1 = got("u1")
    assert(u1.events_in_session == 4)
    assert(u1.session_duration_s == 180)
    assert(u1.categories_explored == 2)
    assert(u1.products_viewed_count == 2)
    assert(u1.preferred_categories == Seq("electronics", "books"))
    assert(u1.cart_size == 0) // added then purchased -> removed
    assert(u1.is_returning_to_product) // last event product A seen before
    assert(got("u2").events_in_session == 1)
  }

  test("userFeatureDeltas emits one delta per event (batch-mode semantics)") {
    // Batch mode, like the userFeatures test: flatMapGroupsWithState
    // runs on batch Datasets with timeouts never firing. (A MemoryStream
    // variant starves processAllAvailable: ProcessingTimeTimeout keeps
    // the trigger loop permanently non-idle.)
    val rows = Features.userFeatureDeltas(events.toDS()).collect()
    assert(rows.count(_.kind == "event") == 5)
    assert(rows.forall(_.kind == "event")) // no timeout → no closures
    // per-event deltas are monotone through u1's session
    val u1 = rows.filter(_.user_id == "u1").sortBy(_.events_in_session)
    assert(u1.map(_.events_in_session).toSeq == Seq(1, 2, 3, 4))
    // cart add then purchase nets to empty cart in the final delta
    assert(u1.last.cart_size == 0)
    assert(u1(2).cart_size == 1) // after add_to_cart, before purchase
    assert(rows.filter(_.user_id == "u2").map(_.events_in_session)
      .toSeq == Seq(1))
  }

  test("dedupStream drops replayed keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Features.dedupStream(
        mem.toDF().withColumn("event_key",
          concat_ws(":", col("user_id"), col("product_id"), col("ts"))),
        Seq("event_key"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      // replay batch 1 (at-least-once source) + two new events
      mem.addData(events.take(3): _*)
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
      // 5 distinct keys survive the replay
      assert(spark.table("dedup_out").count() == 5)
    } finally q.stop()
  }

  test("sketch aggregates run under Structured Streaming (complete mode)") {
    // the typed MG / quantile aggregates are plain udafs, so the same
    // summaries that profile a 100-TB batch also maintain themselves
    // incrementally over a stream — partials per micro-batch, merged
    // into the state store; exact regime ⇒ batch-identical answers
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sdf = mem.toDF().toDF("g", "v")
    val hh = graft.functions.Freq.heavyHittersBy(
      sdf, Seq(col("g")), col("v"), k = 64, threshold = 2L)
    val qu = graft.functions.Quant.quantilesBy(
      sdf, Seq(col("g")), col("v"), k = 64, probesPpm = Seq(500000L))
    val q1 = hh.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    val q2 = qu.writeStream.format("memory").queryName("qs_stream")
      .outputMode("complete").start()
    try {
      mem.addData(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
      q1.processAllAvailable(); q2.processAllAvailable()
      mem.addData(("a", 1L), ("a", 3L), ("b", 7L), ("b", 9L))
      q1.processAllAvailable(); q2.processAllAvailable()
      val heavy = spark.table("mg_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      // a: 1→3, 2→1(below threshold), 3→1(below); b: all singletons
      assert(heavy == Map(("a", 1L) -> 3L))
      val med = spark.table("qs_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // medians over the full stream: a = [1,1,1,2,3] → 1 (rank 3),
      // b = [5,7,9] → 7 (rank 2)
      assert(med == Map("a" -> 1L, "b" -> 7L))
    } finally { q1.stop(); q2.stop() }
  }

  test("count-min matrix maintains itself under a stream (complete mode)") {
    // Cm's groupBy-IS-the-sketch design pays off here for free: the
    // cell matrix is a plain streaming aggregation, so the stream's
    // matrix after N batches equals the batch sketch of their union —
    // and any estimate taken from it inherits that equality.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = graft.functions.Cm.sketch(mem.toDF().toDF("key"),
        org.apache.spark.sql.functions.col("key"), 4, 32)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    val batch1 = Seq(1L, 1L, 2L, 3L)
    val batch2 = Seq(1L, 4L, 4L, 5L, 5L)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cm_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = graft.functions.Cm.sketch(
          (batch1 ++ batch2).toDF("key"),
          org.apache.spark.sql.functions.col("key"), 4, 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(streamed == whole)
    } finally q.stop()
  }

  test("update-mode sketch state: per-batch deltas merge to the batch answer") {
    // the q121/q123 sketches as per-group STATE-STORE state
    // (transformWithState), vs the complete-mode re-aggregation above:
    // each batch emits only touched groups' refreshed profiles, and
    // the LAST emission per group must equal the one-shot aggregate
    // over the full history (sketch merge associativity, exact regime)
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val q = Features.runningGroupSketches(mem.toDS())
      .writeStream.format("memory").queryName("sketch_updates")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
      q.processAllAvailable()
      val afterB1 = spark.table("sketch_updates").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      // batch-1 deltas: a = [1,1,2] (median 1, top 1×2, 2 distinct),
      // b = [5]
      assert(afterB1("a") == ((3L, 1L, 1L, 2L, 2L)))
      assert(afterB1("b") == ((1L, 5L, 5L, 1L, 1L)))
      mem.addData(("a", 1L), ("a", 3L), ("b", 7L), ("b", 9L))
      q.processAllAvailable()
      val rows = spark.table("sketch_updates").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // update mode: exactly one emission per active group per batch
      assert(rows.length == 4)
      val fin = rows.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).toMap // n is monotone → last delta
      // full-history answers: a = [1,1,2,1,3] → n=5, median 1, top
      // 1×3, 3 distinct; b = [5,7,9] → n=3, median 7, singleton tie →
      // lowest key 5, 3 distinct
      assert(fin("a") == (("a", 5L, 1L, 1L, 3L, 3L)))
      assert(fin("b") == (("b", 3L, 7L, 5L, 1L, 3L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming top-k leaderboard: state-store buffers equal batch top-k") {
    // windows can't run on streams; the TopK buffer as
    // transformWithState state can — after each batch the emission
    // must equal batch-mode top-k over everything seen so far
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long, Long)]
    val q = Features.runningTopK(mem.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    def emissions(): Seq[(String, Long, Long, Long)] =
      spark.table("topk_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
    val batch1 = Seq(("a", 1L, 2L, 30L), ("a", 2L, 1L, 10L),
      ("b", 1L, 9L, 5L))
    // batch 2 displaces a's rank-2 and extends b; ties on ord=5
    // break to the lower id (4 beats 9)
    val batch2 = Seq(("a", 1L, 2L, 30L), ("a", 2L, 3L, 20L),
      ("b", 1L, 8L, 7L), ("b", 2L, 4L, 5L))
    try {
      mem.addData(("a", 10L, 1L), ("a", 30L, 2L), ("b", 5L, 9L))
      q.processAllAvailable()
      assert(emissions() == batch1.sorted)
      mem.addData(("a", 20L, 3L), ("b", 7L, 8L), ("b", 5L, 4L))
      q.processAllAvailable()
      // update mode: the sink accumulates one emission set per batch
      assert(emissions() == (batch1 ++ batch2).sorted)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("dedupStream composite keys dedup on the tuple, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // composite key (user_id, product_id): u1×A appears 3 times in the
    // fixture with DIFFERENT event types — the tuple key must collapse
    // them to one, while u1×B / u2×C survive as distinct tuples.
    val q = Features.dedupStream(mem.toDF(), Seq("user_id", "product_id"))
      .writeStream.format("memory").queryName("dedup_comp_out")
      .outputMode("append").start()
    try {
      mem.addData(events.take(4): _*)
      q.processAllAvailable()
      // at-least-once replay of the first batch + the remaining event
      mem.addData(events.take(4): _*)
      mem.addData(events.drop(4): _*)
      q.processAllAvailable()
      val out = spark.table("dedup_comp_out")
        .select("user_id", "product_id").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(out == Seq(("u1", "A"), ("u1", "B"), ("u2", "C")))
    } finally q.stop()
  }

  test("runningUserFeatures accumulates state across query RESTARTS " +
      "(transformWithState + RocksDB checkpoint recovery)") {
    // Trigger.AvailableNow (not processAllAvailable): ProcessingTime
    // time mode keeps the trigger loop non-idle servicing potential
    // timer/TTL expirations, so an always-on query never quiesces —
    // the same starvation the ProcessingTimeTimeout tests dodge by
    // running batch mode. AvailableNow drains and STOPS, and a second
    // run over the same checkpoint proves state recovery.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws").toString
    val mem = MemoryStream[Event]
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    // ("does not support recovering"), and the restart IS the test
    val sunk = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Double)]
    def drain(): Unit = {
      val q = Features.runningUserFeatures(mem.toDS())
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[Features.UserRunning],
           _: Long) =>
            sunk.synchronized {
              sunk ++= b.collect().map(u =>
                (u.user_id, u.n_events, u.n_purchases, u.total_value))
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("update").start()
      q.awaitTermination()
    }
    try {
      mem.addData(events.take(2): _*) // u1: 2 views
      drain()
      mem.addData(events.drop(2): _*) // u1: cart+purchase, u2: view
      drain()
      // run 2 only saw 3 events, but totals include run 1's state,
      // recovered from the RocksDB checkpoint
      val rows = sunk.toSeq
      assert(rows.filter(_._1 == "u1").maxBy(_._2) ==
        (("u1", 4L, 1L, 35.0)))
      assert(rows.filter(_._1 == "u2").maxBy(_._2) ==
        (("u2", 1L, 0L, 7.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("IvfUpsert accumulates per-cell census across query RESTARTS " +
      "(transformWithState + RocksDB checkpoint recovery)") {
    import graft.streaming.IvfUpsert
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ivf_ups").toString
    val mem = MemoryStream[(Long, Long)]
    val sunk = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    def drain(): Unit = {
      val q = IvfUpsert.upsert(
          mem.toDS().map(p => IvfUpsert.VecObs(p._1, p._2)))
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[IvfUpsert.CellCensus],
           _: Long) =>
            sunk.synchronized {
              sunk ++= b.collect().map(c => (c.cell, c.n_new, c.sum_d2))
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("update").start()
      q.awaitTermination()
    }
    try {
      mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
      drain()
      mem.addData((1L, 5L), (2L, 5L))
      drain()
      // run 2 only saw one arrival per cell, but the census includes
      // run 1's counts, recovered from the RocksDB checkpoint
      val byCell = sunk.toSeq.groupBy(_._1)
      assert(byCell(1L).maxBy(_._2) == ((1L, 3L, 35L)))
      assert(byCell(2L).maxBy(_._2) == ((2L, 2L, 10L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("IvfUpsert.assign picks the nearest centroid with lowest-cell " +
      "ties (per-row fold, no window)") {
    import graft.streaming.IvfUpsert
    // 2-dim embeddings: v0=(1,0) → cell 10 exactly; v1=(0,1) → cell
    // 20 exactly; v2=(√½,√½) equidistant from both → tie → cell 10
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Array(1000000L, 0L)),
      (20L, Array(0L, 1000000L)))
      .toDF("cell", "cku")
    val got = IvfUpsert.assign(IvfUpsert.units(emb),
        IvfUpsert.centroidRow(cents))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(0L) == ((10L, 0L)))
    assert(got(1L) == ((20L, 0L)))
    assert(got(2L)._1 == 10L) // exact tie → lowest cell id
  }

  test("enrichStream joins a static dimension without dropping events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq(("A", "Widget"), ("B", "Gadget"))
      .toDF("product_id", "product_name")
    val q = Features.enrichStream(mem.toDF(), dim, "product_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(events: _*) // includes product C, absent from dim
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("product_id", "product_name").distinct()
        .collect().map(r => r.getString(0) -> Option(r.getString(1)))
        .toSet
      assert(got == Set("A" -> Some("Widget"), "B" -> Some("Gadget"),
        "C" -> None))
    } finally q.stop()
  }

  test("idempotentSink skips a re-delivered batchId (replay-safe append)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sink").toString
    val sink = Features.idempotentSink(s"$root/out", s"$root/markers")
    val batch = events.take(3).toDF()
    sink(batch, 0L)
    sink(batch, 0L) // crash-restart re-delivery: same id, same data
    sink(events.drop(3).toDF(), 1L)
    assert(spark.read.parquet(s"$root/out").count() == 5)
    // markers carry row counts for reconciliation
    assert(java.nio.file.Files
      .readString(java.nio.file.Path.of(s"$root/markers/batch-0")) == "3")
  }

  test("IncrementalSilverJob processes only NEW files per invocation") {
    val root = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val landing = new java.io.File(s"$root/landing"); landing.mkdirs()
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(landing, name).toPath, lines.mkString("\n"))
    writeFile("h1.json", Seq(
      """{"event_id":"a1","user_id":"1","event_type":"view","item_id":"A","timestamp":"2025-09-05T12:00:00Z"}""",
      """{"event_id":"a2","user_id":"2","event_type":"click","item_id":"B","timestamp":"2025-09-05T12:10:00Z"}"""))
    graft.app.IncrementalSilverJob.run(spark, landing.toString,
      s"$root/silver", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/silver").count() == 2)
    // second hour arrives; re-run processes ONLY the new file
    writeFile("h2.json", Seq(
      """{"event_id":"b1","user_id":"1","event_type":"purchase","item_id":"A","timestamp":"2025-09-05T13:00:00Z","price":9.0}"""))
    graft.app.IncrementalSilverJob.run(spark, landing.toString,
      s"$root/silver", s"$root/ckpt")
    val silver = spark.read.parquet(s"$root/silver")
    assert(silver.count() == 3) // appended 1, not re-landed h1's 2
    assert(silver.filter(col("event_id") === "b1").count() == 1)
  }

  test("rollingProductViews windowed aggregation over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = Features.rollingProductViews(mem.toDF())
      .writeStream.format("memory").queryName("rolling")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode holds rows until the watermark passes; advance it
      mem.addData(Event("u9", "Z", "misc", "view", 1.0,
        Timestamp.valueOf("2025-09-05 15:00:00")))
      q.processAllAvailable()
      val rows = spark.table("rolling")
        .filter(col("product_id") === "A")
      // product A viewed once at 12:00 -> appears in 12 sliding windows
      assert(rows.count() == 12)
      assert(rows.select(max(col("views_last_hour"))).head().getLong(0) == 1)
    } finally q.stop()
  }

  test("sessionAggregates groups by 15-min inactivity sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val burst2 = Seq( // second session for u1, 40 min later
      Event("u1", "D", "misc", "view", 1.0, ts(45)),
      Event("u1", "D", "misc", "click", 1.0, ts(46)))
    mem.addData(events ++ burst2: _*)
    val q = Features.sessionAggregates(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(Event("u9", "Z", "misc", "view", 1.0,
        Timestamp.valueOf("2025-09-05 16:00:00")))
      q.processAllAvailable()
      val u1 = spark.table("sessions").filter(col("user_id") === "u1")
        .orderBy("session_start").collect()
      assert(u1.length == 2)
      assert(u1(0).getAs[Long]("events_in_session") == 4)
      assert(u1(1).getAs[Long]("events_in_session") == 2)
    } finally q.stop()
  }

  test("productStats conversion rates") {
    val got = Features.productStats(events.toDF())
      .filter(col("product_id") === "A").head()
    assert(got.getAs[Long]("view_count") == 1)
    assert(got.getAs[Long]("purchases") == 1)
    assert(got.getAs[Double]("conversion_rate") == 100.0)
  }

  test("Monitor listener records per-query progress (T9)") {
    implicit val sqlCtx = spark.sqlContext
    val m = graft.streaming.Monitor.attach(spark)
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = mem.toDF().groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("mon_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // listener delivery is async; poll briefly
    var tries = 0
    var st = m.snapshot.values.find(_.name == "mon_test")
    while ((st.isEmpty || st.exists(_.totalRows < 5)) && tries < 50) {
      Thread.sleep(100); tries += 1
      st = m.snapshot.values.find(_.name == "mon_test")
    }
    assert(st.exists(_.totalRows == 5))
    assert(st.exists(_.batches >= 1))
    // detach unregisters AND drops retained stats — the monitor's
    // whole lifecycle contract (stacking live listeners per pipeline
    // run is the leak this API exists to prevent)
    m.detach(spark)
    assert(m.snapshot.isEmpty)
  }

  test("fanOutQuery lands user/product/signal sinks per batch (T6)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val base = java.nio.file.Files.createTempDirectory("fanout").toString
    val q = Features.fanOutQuery(mem.toDF(),
      s"$base/user", s"$base/prod", s"$base/signals", s"$base/cp").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$base/user").count() == 5)
    // product rollup: one row per product in the batch
    assert(spark.read.parquet(s"$base/prod").count() == 3)
    // high-value signals: add_to_cart + purchase
    assert(spark.read.parquet(s"$base/signals").count() == 2)
  }

  test("attributionStream joins purchases to prior-hour views only") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, user_id, product_id, ts)
    val pMem = MemoryStream[(Long, String, String, Timestamp)]
    val vMem = MemoryStream[(Long, String, String, Timestamp)]
    def df(m: MemoryStream[(Long, String, String, Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "product_id", "ts")
    val q = Features.attributionStream(df(pMem), df(vMem))
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      vMem.addData(
        (1L, "u1", "A", ts(0)),  // 12:00 — in [11:10, 12:10)
        (2L, "u1", "B", ts(9)),  // 12:09 — ON purchase instant: excluded
        (3L, "u2", "C", ts(5)))  // other user: excluded
      pMem.addData((10L, "u1", "P", ts(9))) // purchase at 12:09
      q.processAllAvailable()
      // view 75 min before a later u1 purchase: outside the hour
      vMem.addData((4L, "u1", "D",
        Timestamp.valueOf("2025-09-05 13:00:00")))
      pMem.addData((11L, "u1", "P2",
        Timestamp.valueOf("2025-09-05 14:15:00")))
      q.processAllAvailable()
      val rows = spark.table("attribution")
        .select("purchase_id", "viewed_product")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(rows.toSeq == Seq((10L, "A")))
    } finally q.stop()
  }

  test("mid-batch SINK failure: replayed batch commits transformWithState " +
      "exactly once") {
    // Failure-injection soak (T1/T7's last untested failure mode):
    // the sink consumes batch 1's rows — so the stateful operator's
    // tasks have RUN — then dies before acknowledging. The commit log
    // never records batch 1, the restart replays it against the
    // PRE-batch-1 state version, and the totals come out exactly once
    // despite the state tasks executing twice. That version-addressed
    // replay is the whole exactly-once contract of the state store.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_failsink").toString
    val mem = MemoryStream[Event]
    val failArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sunk = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Double)]
    def drain(): Option[Throwable] = {
      val q = Features.runningUserFeatures(mem.toDS())
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[Features.UserRunning],
           id: Long) =>
            val rows = b.collect() // state tasks run HERE
            attempts.synchronized { attempts += id }
            if (failArmed.getAndSet(false))
              throw new RuntimeException("injected mid-batch sink failure")
            sunk.synchronized {
              sunk ++= rows.map(u => (id, u.user_id, u.n_events,
                u.n_purchases, u.total_value))
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("update").start()
      try { q.awaitTermination(); None }
      catch { case e: Throwable => q.stop(); Some(e) }
    }
    try {
      mem.addData(events.take(2): _*) // u1: 2 views
      assert(drain().isEmpty)
      mem.addData(events.drop(2): _*) // u1: cart+purchase, u2: view
      failArmed.set(true)
      val err = drain() // batch 1 computed, then sink dies
      assert(err.isDefined, "injected failure did not surface")
      assert(drain().isEmpty) // restart: replay batch 1 from checkpoint
      // the batch ran (at least) twice...
      assert(attempts.count(_ == 1L) >= 2, s"attempts $attempts")
      // ...but committed once: one successful delivery per batchId,
      // and the totals are the no-failure values — no double count
      val committed = sunk.toSeq
      assert(committed.map(_._1).distinct.sorted ==
        committed.map(_._1).distinct)
      assert(committed.filter(r => r._1 == 1L && r._2 == "u1").map(
        r => (r._3, r._4, r._5)) == Seq((4L, 1L, 35.0)))
      assert(committed.filter(r => r._1 == 1L && r._2 == "u2").map(
        r => (r._3, r._4, r._5)) == Seq((1L, 0L, 7.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("mid-batch SOURCE-TASK failure: sketch state replays to the " +
      "one-shot answer") {
    // The other injection point: a task INSIDE the stateful batch
    // throws (flaky decode/IO stand-in), so the batch dies before the
    // sink ever sees it. Restart must replay the batch and the final
    // sketch profiles must equal the one-shot full-history aggregate
    // — the same answers the no-failure update-mode test pins.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_failsrc").toString
    val mem = MemoryStream[(String, Long)]
    val sunk = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long, Long)]
    def drain(): Option[Throwable] = {
      val src = mem.toDS().map { x =>
        if (StreamingSpec.sourceFailArmed.getAndSet(false))
          throw new RuntimeException("injected mid-batch task failure")
        x
      }
      val q = Features.runningGroupSketches(src)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[Features.GroupProfile],
           _: Long) =>
            sunk.synchronized {
              sunk ++= b.collect().map(p => (p.g, p.n, p.median,
                p.top_key, p.top_est, p.n_distinct))
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("update").start()
      try { q.awaitTermination(); None }
      catch { case e: Throwable => q.stop(); Some(e) }
    }
    try {
      mem.addData(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
      assert(drain().isEmpty)
      mem.addData(("a", 1L), ("a", 3L), ("b", 7L), ("b", 9L))
      StreamingSpec.sourceFailArmed.set(true)
      val err = drain() // batch 1's source task dies mid-flight
      assert(err.isDefined, "injected failure did not surface")
      assert(drain().isEmpty) // replay from checkpoint
      // last emission per group == one-shot full-history profile
      // (values from the no-failure update-mode test above)
      val fin = sunk.toSeq.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).toMap
      assert(fin("a") == (("a", 5L, 1L, 1L, 3L, 3L)))
      assert(fin("b") == (("b", 3L, 7L, 5L, 1L, 3L)))
    } finally {
      StreamingSpec.sourceFailArmed.set(false)
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("bronzeLanding partitions by event-time y/m/d/h") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val out = java.nio.file.Files.createTempDirectory("bronze").toString
    val cp = java.nio.file.Files.createTempDirectory("cp").toString
    val q = Features.bronzeLanding(mem.toDF(), out, cp).start()
    try q.processAllAvailable() finally q.stop()
    assert(new java.io.File(
      s"$out/year=2025/month=9/day=5/hour=12").exists())
    assert(spark.read.json(s"$out/year=*/month=*/day=*/hour=*")
      .count() == 5)
  }
}

object StreamingSpec {
  /** Armed flag for the source-task failure injection: lives on a
    * top-level object so the closure serialized into the task reads
    * the SAME flag the test arms (local mode, one JVM). */
  val sourceFailArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
