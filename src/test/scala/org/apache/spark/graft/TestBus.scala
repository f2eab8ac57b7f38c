package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: metrics
  * listeners in specs must drain pending events before reading their
  * accumulators, or task-end events race the assertion. */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
