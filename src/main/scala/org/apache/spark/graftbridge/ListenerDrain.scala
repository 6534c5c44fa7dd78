package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Package bridge to `LiveListenerBus.waitUntilEmpty()` (private[spark]).
  *
  * Stable per-query bench metrics (task counts, shuffle bytes) are
  * collected by a SparkListener; the listener bus is ASYNCHRONOUS, so a
  * snapshot taken right after an action can miss in-flight events and
  * turn a deterministic metric into a noisy one — the exact failure the
  * metrics exist to prevent. Draining the bus between queries makes the
  * snapshot exact. A subpackage of org.apache.spark sees the
  * private[spark] member; the standard OSS pattern (Delta, frameless)
  * for reaching a stable-but-unexposed internal, kept to this one call.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
