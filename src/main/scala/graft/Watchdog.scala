package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the harness mains: runs a body under a
  * Spark job group with a wall-clock limit and CANCELS the group's
  * jobs on timeout, so one pathological query can never hang the
  * whole evidence dump (the r2 failure mode was a harness-level
  * timeout zeroing every query's evidence at once; this bounds the
  * blast radius to the one query).
  */
object Watchdog {
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-watchdog")
    t.setDaemon(true)
    t
  })

  /** Run `body`, returning None on success or Some(error message) on
    * failure/timeout. The job group is set INSIDE the worker thread
    * (job-group state is thread-local). */
  def run(spark: SparkSession, name: String, timeoutSec: Long)
         (body: => Unit): Option[String] = {
    val group = s"graft-watchdog-$name"
    val fut = pool.submit(new java.util.concurrent.Callable[Option[String]] {
      override def call(): Option[String] =
        try {
          spark.sparkContext.setJobGroup(group, name,
            interruptOnCancel = true)
          body
          None
        } catch {
          case e: Throwable => Some(
            s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replace('\n', ' ').take(160))
        } finally spark.sparkContext.clearJobGroup()
    })
    try fut.get(timeoutSec, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        Some(s"watchdog timeout after ${timeoutSec}s (job group cancelled)")
      case e: Throwable =>
        Some(s"watchdog: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
