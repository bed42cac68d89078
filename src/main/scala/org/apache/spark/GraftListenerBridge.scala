package org.apache.spark

/** Bridge to `private[spark]` listener-bus draining: metric listeners
  * receive task events asynchronously, so a per-query shuffle tally
  * must drain the bus before reading its counters (the same mechanism
  * Spark's own test utilities use). No internals are modified. */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
