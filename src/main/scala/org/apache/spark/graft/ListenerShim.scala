package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus. Bench reads per-query
  * stage counts off a SparkListener, and listener delivery is async — a
  * wall-clock sleep between queries let events from one query be counted
  * against the next under host load, skewing the per-query floor-adjusted
  * numbers BENCH_COMPARE.md publishes. Draining the bus before reading
  * the counter makes the attribution exact. (Second of the two private
  * touch points, next to sql.graft.ColumnShim.)
  */
object ListenerShim {
  /** Block until every queued listener event is delivered (bounded). */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
