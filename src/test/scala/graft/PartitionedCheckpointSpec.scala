package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.PartitionedCheckpoint

/** [[org.apache.spark.sql.graft.PartitionedCheckpoint]] — the
  * partitioning-preserving eager checkpoint behind the co-occurrence
  * scaffold. Pins: values identical to the plain frame, the declared
  * metadata actually removes the downstream exchange under AQE (the
  * whole point — plain localCheckpoint loses it, CkptPartProbe), and
  * the declared layout matches physically (per-partition key
  * disjointness + in-partition order). */
class PartitionedCheckpointSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    (1 to 5000).map(i => (i % 43L, i.toLong)).toDF("b", "i").distinct()
  }

  test("values identical to the un-stamped frame") {
    val plain = fixture.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = PartitionedCheckpoint.byKey(fixture, Seq("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == plain)
  }

  test("keyed aggregation on the checkpoint plans with no Exchange") {
    val ck = PartitionedCheckpoint.byKey(fixture, Seq("b"))
    val plan = ck.groupBy("b").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("self-join on the key plans with no input Exchange") {
    val ck = PartitionedCheckpoint.byKey(fixture, Seq("b"))
    val j = ck.as("x").join(ck.as("y"),
      col("x.b") === col("y.b") && col("x.i") < col("y.i"))
    // executedPlan BEFORE any downstream keyed agg: the join itself
    // must not exchange either side
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // and the join result matches the un-stamped self-join
    val want = fixture.as("x").join(fixture.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .count()
    assert(j.count() == want)
  }

  test("physical layout matches the declared metadata") {
    val ck = PartitionedCheckpoint.byKey(fixture, Seq("b"))
    // key-disjoint partitions: no b value appears in two partitions
    val perPart = ck.select(col("b"),
        org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().groupBy("b")
      .agg(countDistinct(col("p")).as("np"))
      .agg(max(col("np"))).head().getLong(0)
    assert(perPart == 1L)
    // in-partition ascending key order (mapPartitions scan)
    import spark.implicits._
    val sortedOk = ck.select(col("b")).as[Long].mapPartitions { it =>
      var prev = Long.MinValue
      var ok = true
      it.foreach { v => if (v < prev) ok = false; prev = v }
      Iterator.single(ok)
    }.collect().forall(identity)
    assert(sortedOk)
  }

  test("Checkpoints.free releases the blocks") {
    val ck = PartitionedCheckpoint.byKey(fixture, Seq("b"))
    assert(ck.count() > 0)
    graft.functions.Checkpoints.free(ck, blocking = true)
    // checkpointed plans have no lineage to recompute — a later
    // action must fail rather than silently recompute
    intercept[Exception] { ck.count() }
  }
}
