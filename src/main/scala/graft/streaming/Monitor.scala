package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** T9: stream monitoring (SURVEY §2.8) — the reference's per-topic
  * message counters and progress logging
  * (`ingestion/stream-processor/feature_monitor.py:1-51`,
  * `kafka_streams_processor.py:238-243`) as a
  * `StreamingQueryListener`: per-query processed-row totals, batch
  * counts, and last observed rate, with zero touch on the data path.
  */
final class Monitor extends StreamingQueryListener {
  import Monitor.QueryStats

  private val stats = new ConcurrentHashMap[String, QueryStats]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = {
    stats.put(e.id.toString,
      QueryStats(Option(e.name).getOrElse(e.id.toString), 0L, 0L, 0.0))
  }

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    stats.compute(p.id.toString, (_, prev) => {
      val base = Option(prev).getOrElse(
        QueryStats(Option(p.name).getOrElse(p.id.toString), 0L, 0L, 0.0))
      base.copy(
        batches = base.batches + 1,
        totalRows = base.totalRows + p.numInputRows,
        lastRowsPerSec = p.processedRowsPerSecond)
    })
  }

  // Terminated queries' stats are RETAINED deliberately: the natural
  // read pattern is `query.awaitTermination(); monitor.snapshot` —
  // evicting here would race the caller out of its final totals. The
  // retention bound is therefore the monitor's lifetime: call
  // `detach()` when done (see below).
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, QueryStats] = {
    val out = Map.newBuilder[String, QueryStats]
    stats.forEach((k, v) => out += (k -> v))
    out.result()
  }

  /** Unregister from the session and drop all retained stats. Without
    * this a long-lived session attaching a monitor per pipeline run
    * stacks live listeners — each one processing every progress event
    * of every stream and holding every query's stats forever. */
  def detach(spark: SparkSession): Unit = {
    spark.streams.removeListener(this)
    stats.clear()
  }
}

object Monitor {
  final case class QueryStats(
      name: String, batches: Long, totalRows: Long,
      lastRowsPerSec: Double)

  /** Attach a fresh monitor to the session's streams. Pair with
    * [[Monitor.detach]] when the monitoring scope ends. */
  def attach(spark: SparkSession): Monitor = {
    val m = new Monitor
    spark.streams.addListener(m)
    m
  }
}
