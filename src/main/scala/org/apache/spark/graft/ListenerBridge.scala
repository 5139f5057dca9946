package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus draining: the bus is ASYNC,
  * so a metrics listener (graft.Bench's shuffle-byte collector) reading
  * its counters right after a job finishes may miss stage-completed
  * events still queued. `waitUntilEmpty()` is the exact primitive Spark's
  * own tests use to fence that race — a bounded-wait flush, typically
  * microseconds on an idle bus. Lives under `org.apache.spark` for
  * access, same pattern as [[org.apache.spark.sql.graft.GraftSql]]; no
  * Spark internals are modified. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (bounded
    * by the bus's internal timeout; a TimeoutException means the bus is
    * wedged — surface it, the metrics would be silently wrong). */
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
