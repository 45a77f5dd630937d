package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (private[spark]): lets the bench
  * drain pending listener events before snapshotting task-metric tallies,
  * so per-leg CPU attribution is exact instead of racing the async bus. */
object Listeners {
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
