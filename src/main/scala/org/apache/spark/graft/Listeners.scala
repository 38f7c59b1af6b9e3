package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` accessor (same technique as sql.graft.Bridge):
  * the listener bus is asynchronous, so task-metric adders read
  * immediately after an action under-report — profilers must drain
  * the bus first to get exact totals. */
object Listeners {
  def settle(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
