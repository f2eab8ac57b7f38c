package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

import graft.functions.Skew

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* functions callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql(
      "SELECT graft_simhash16(array('a','b','c')) AS s").head().getInt(0)
    assert(sh >= 0 && sh < 65536)
    val mh = spark.sql(
      "SELECT size(graft_minhash(array('x y z'))) AS n").head().getInt(0)
    assert(mh == 16)
    val fp = spark.sql(
      "SELECT graft_gram8_fingerprint('abcdefghij').n_distinct_grams AS n")
      .head().getInt(0)
    assert(fp == 3)
  }

  test("SelfDotRewrite: graft_dot(x, x) optimizes to graft_self_dot") {
    import graft.functions.Vectors
    // spark.range is a real source — a local Seq would be folded into
    // a LocalRelation at optimize time, hiding the rewrite
    val base = spark.range(1, 3)
      .select(array(col("id").cast("double"),
        (col("id") * 2).cast("double")).as("e"))
    val df = base.select(col("e"), Vectors.norm(col("e")).as("nrm"),
      Vectors.dot(col("e"), col("e")).as("sq"))
    // the rule (injected via spark.sql.extensions in SparkSpec) rewrote
    // the self-dot; a dot of distinct columns must NOT be rewritten
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_self_dot"), opt)
    val rows = df.collect()
    // e = [1,2] and [2,4]: sums of squares 5 and 20, bit-identical
    assert(rows.map(_.getDouble(2)).toSeq == Seq(5.0, 20.0))
    assert(rows.map(_.getDouble(1)).toSeq ==
      Seq(math.sqrt(5.0), math.sqrt(20.0)))
    val mixed = base.select(col("e").as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
      .select(Vectors.dot(col("a"), col("b")).as("d"))
    val optMixed = mixed.queryExecution.optimizedPlan.toString
    assert(!optMixed.contains("graft_self_dot"), optMixed)
    assert(mixed.collect().map(_.getDouble(0)).toSeq == Seq(11.0, 22.0))
  }

  test("salted aggregation equals direct aggregation on a hot key") {
    val rows = (1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => (s"k$i", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(df, "k", "v", buckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == direct)
  }

  test("salted join equals plain join on a hot key, row for row") {
    val big = ((1 to 500).map(i => (7L, i)) ++
      (1 to 20).map(i => (i.toLong, 1000 + i))).toDF("bk", "payload")
    val right = (1 to 30).map(i => (i.toLong, s"r$i")).toDF("rk", "attr")
    val plain = big.join(right, col("bk") === col("rk"))
      .select(col("bk"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq.sorted
    val salted = Skew
      .saltedJoin(big, right, "bk", "rk", buckets = 8, col("payload"))
      .select(col("bk"), col("payload"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq.sorted
    assert(salted == plain)
    // the hot key's rows really spread over multiple salt buckets
    val spread = big.filter(col("bk") === 7L)
      .select(Skew.salt(8, col("payload")).as("s"))
      .distinct().count()
    assert(spread > 1, s"hot key landed in $spread bucket(s)")
  }

  test("saltedJoin rejects reserved __salt columns") {
    val df = Seq((1L, 0)).toDF("k", "__salt")
    val other = Seq((1L, "x")).toDF("rk", "attr")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, other, "k", "rk", buckets = 4)
    }
  }

  test("salt is deterministic (safe under task retries)") {
    val df = Seq((1, 2.0), (1, 2.0)).toDF("a", "b")
      .select(Skew.salt(16, col("a"), col("b")).as("s"))
    val vals = df.collect().map(_.getInt(0))
    assert(vals(0) == vals(1) && vals(0) >= 0 && vals(0) < 16)
  }

  // ---- AQE vs manual salt: the adjudication (round-6 verdict #6) ----

  /** Max shuffle-read volume any single task saw — the straggler
    * metric. Measured in BYTES, not records: partial-aggregate
    * buffers (collect_list et al.) cross the exchange as ONE row per
    * (key, map partition) whose payload holds every value, so record
    * counts hide exactly the concentration this adjudication is
    * about. */
  private def maxTaskShuffleReadBytes(body: => Unit): Long = {
    val mx = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead
          mx.updateAndGet(v => math.max(v, r))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; org.apache.spark.GraftTestBus.drain(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(listener)
    mx.get()
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("adjudication: AQE splits JOIN skew natively (plan shows skew=true)") {
    // A skewed sort-merge join: with the skew thresholds lowered to
    // fixture scale, AQE 4.x marks and splits the hot partition at
    // runtime — manual salting is NOT required for inner SMJ joins.
    val big = ((1 to 200000).map(i => (7L, i)) ++
      (1 to 20000).map(i => ((i % 50 + 100).toLong, i))).toDF("bk", "payload")
    val right = (1 to 200).map(i => (i.toLong, s"r$i")).toDF("rk", "attr")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      // 16 reduce partitions so the hot one towers over the MEDIAN
      // (with the suite default of 2, the hot partition IS the
      // median and the factor test can never fire)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
      val joined = big.join(right, col("bk") === col("rk"))
      val t0 = System.nanoTime()
      // collect() (not count()) so the FINAL adaptive plan lands on
      // this frame's own queryExecution
      val n = joined.collect().length
      val aqeSec = (System.nanoTime() - t0) / 1e9
      assert(n == 220000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
      val t1 = System.nanoTime()
      val ns = Skew.saltedJoin(big, right, "bk", "rk", 8, col("payload"))
        .count()
      val saltSec = (System.nanoTime() - t1) / 1e9
      assert(ns == n)
      info(f"skewed SMJ 220k rows: AQE-split $aqeSec%.2fs vs manual salt $saltSec%.2fs")
      System.err.println(
        f"[skew-adjudication] join: AQE skew-split $aqeSec%.2fs, manual salt $saltSec%.2fs (equal results)")
    }
  }

  test("adjudication: algebraic agg skew is already solved by partial aggregation (measured)") {
    // Honesty check on the saltedSumCount doc: for sum/count, map-side
    // combine collapses a hot key to ONE partial row per map
    // partition BEFORE the shuffle, so the reducer never sees the hot
    // key's raw rows and AQE has nothing left to split. Salting
    // algebraic aggregates is therefore belt-and-braces, not a
    // necessity — the real salt territory is the next test.
    val rows = (1 to 200000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("k", "v").repartition(8).localCheckpoint()
    val plainMax = maxTaskShuffleReadBytes {
      df.groupBy(col("k")).agg(sum(col("v"))).count(): Unit
    }
    info(s"plain sum over 200k-row hot key: max task shuffle-read $plainMax bytes")
    System.err.println(
      s"[skew-adjudication] algebraic agg: partial aggregation leaves only $plainMax shuffled bytes in the largest task")
    // 51 keys x 8 map partitions x ~40B/row is the worst case the
    // reducer can see; the raw hot key would be ~200k x 12B = 2.4MB
    assert(plainMax <= 64L * 1024,
      s"partial aggregation should have collapsed the hot key, saw $plainMax bytes")
  }

  test("adjudication: rank-limit window skew is solved natively by WindowGroupLimit (measured)") {
    // Surprise finding of this adjudication: the q76-style top-K
    // window with a rank filter — the classic manual-salt territory —
    // is ALSO de-skewed natively in Spark 4: the WindowGroupLimit
    // rewrite (SPARK-37099) prunes each map partition to K rows per
    // key BEFORE the exchange, so the hot key never concentrates.
    // Measured: the exchange carries ~keys x mapPartitions rows, not
    // the 200k hot-key rows.
    val rows = (1 to 200000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("k", "v").repartition(8).localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    val top1 = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("v"))))
      .filter(col("rn") === 1)
    val mx = maxTaskShuffleReadBytes { top1.count(): Unit }
    info(s"rank-limit window over a 200k-row hot key: max task shuffle-read $mx bytes")
    System.err.println(
      s"[skew-adjudication] rank-limit window: WindowGroupLimit pre-prunes, max task read $mx bytes")
    assert(top1.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    // pruned exchange carries ~keys x mapPartitions tiny rows; the raw
    // hot key would be ~2.4MB
    assert(mx <= 64L * 1024,
      s"WindowGroupLimit should have pre-pruned the hot key, saw $mx bytes")
  }

  test("adjudication: large-state aggregation — AQE cannot split it, salt spreads ONLY phase one (measured)") {
    // The honest finding: for aggregates whose partial state is the
    // data itself (collect_list-class), map-side combine cannot
    // shrink the payload, AQE has no mechanism to split a single
    // group key, AND two-phase salting cannot help the FINAL landing
    // either — if the consumer needs the whole per-key list, those
    // bytes inherently converge on one task. What salting does buy is
    // phase ONE: the sort/buffer of the raw rows spreads over
    // (key, salt) sub-keys, bounding the straggler's merge memory.
    // At 100 TB the real fix is restructuring the consumer
    // (partitioned writes, windowed chunks), not salt.
    val buckets = 8
    val rows = (1 to 200000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("k", "v").repartition(8).localCheckpoint()
    // 16 reduce partitions (suite default is 2, which cannot separate
    // 8 salt sub-keys), and an advisory size at fixture scale —
    // otherwise AQE's partition COALESCING re-merges the spread
    // sub-keys right back into one task (everything here is far below
    // the 64MB default advisory; at production scale a hot key dwarfs
    // it and the coalescer leaves the spread alone)
    withConf("spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
      // parallelismFirst coalesces everything under its 1MB floor
      // into ONE partition at fixture scale — disable it and lower
      // the floor so coalescing respects the advisory size here
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64KB") {
      runCase()
    }
    def runCase(): Unit = {
    def plainLists = df.groupBy(col("k"))
      .agg(collect_list(col("v")).as("vs"))
    def phase1 = df
      .withColumn("__salt", Skew.salt(buckets, col("v")))
      .groupBy(col("k"), col("__salt"))
      .agg(collect_list(col("v")).as("pl"))
    def saltedLists = phase1.groupBy(col("k"))
      .agg(flatten(collect_list(col("pl"))).as("vs"))
    // identical multisets per key (list order is partition-dependent
    // in both forms, so compare sorted)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("k"), array_sort(col("vs")).as("vs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(canon(saltedLists) == canon(plainLists))
    // consume the lists (sum of sizes): a bare count() would let the
    // optimizer PRUNE the collect_list column and nothing would cross
    val plainMax = maxTaskShuffleReadBytes {
      plainLists.select(sum(size(col("vs")))).head(): Unit
    }
    val phase1Max = maxTaskShuffleReadBytes {
      phase1.select(sum(size(col("pl")))).head(): Unit
    }
    val fullSaltMax = maxTaskShuffleReadBytes {
      saltedLists.select(sum(size(col("vs")))).head(): Unit
    }
    info(s"max task shuffle-read bytes: plain $plainMax, salted phase-1 only $phase1Max, salted end-to-end $fullSaltMax")
    System.err.println(
      s"[skew-adjudication] large-state agg: plain=$plainMax phase1-salted=$phase1Max full-salted=$fullSaltMax bytes into one task")
    // the hot key payload is ~200k longs (~850KB serialized):
    // plain concentrates it all in one task...
    assert(plainMax >= 800L * 1024,
      s"expected the hot key payload concentrated, saw $plainMax bytes")
    // ...salting bounds PHASE ONE at a few sub-keys' worth (hash
    // placement can co-locate a couple of the 8 sub-keys)...
    assert(phase1Max * 3 <= plainMax,
      s"phase-1 salt failed to spread: plain=$plainMax phase1=$phase1Max")
    // ...and the END-TO-END salted form still concentrates the final
    // per-key list — the honest limit of the technique
    assert(fullSaltMax >= 800L * 1024,
      s"expected the final landing still concentrated, saw $fullSaltMax")
    }
  }
}
