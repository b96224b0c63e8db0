package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only shim over `private[spark]` listener internals: specs that
  * measure task metrics must drain the async listener bus before
  * reading their counters.
  */
object TestListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
