package org.apache.spark

/** Bridge into `private[spark]` listener-bus draining: listener events are
  * posted asynchronously, so a test that collects SQL-execution plan info
  * must flush the bus before reading its collection (the same accessor
  * Spark's own listener suites use). */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext,
                                timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
