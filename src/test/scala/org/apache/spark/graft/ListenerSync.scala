package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the (private[spark]) listener bus, so job-count
  * assertions can flush async listener events before reading counters. */
object ListenerSync {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000L)
}
