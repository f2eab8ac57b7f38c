package graft.functions

import org.apache.spark.sql.SparkSession

/** Overlap INDEPENDENT job-submitting tasks from driver threads (the
  * scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). The ladder-style operators (q344/q350 beam
  * budgets) run B independent chains of tiny eager-checkpoint rounds;
  * sequentially each round is a near-empty job paying fixed
  * submit/schedule overhead on an idle 32-core host — concurrently
  * the chains back-fill each other and the section's wall time drops
  * to the longest chain.
  *
  * Spark job-group state is thread-local, so the caller's group /
  * description / interrupt flag are re-established INSIDE every
  * worker thread — a harness watchdog (graft.Watchdog) can still
  * cancel the whole query's jobs on timeout, exactly as in the
  * sequential form. Results return in task order (determinism is the
  * caller's: independent tasks, order-fixed merge). The first task
  * failure is rethrown after all workers settle.
  */
object Concurrent {
  def inParallel[T](spark: SparkSession, tasks: Seq[() => T]): Seq[T] = {
    if (tasks.sizeIs <= 1) return tasks.map(_())
    val sc = spark.sparkContext
    val group = sc.getLocalProperty("spark.jobGroup.id")
    val desc = sc.getLocalProperty("spark.job.description")
    val interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      tasks.size,
      (r: Runnable) => {
        val t = new Thread(r, "graft-ladder")
        t.setDaemon(true)
        t
      })
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = {
            if (group != null)
              sc.setJobGroup(group,
                if (desc == null) group else desc,
                interruptOnCancel = interrupt == "true")
            t()
          }
        })
      }
      // unwrap ExecutionException so the harness records the real
      // failure class, not the executor plumbing
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
