package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Dev-bench helper: block until the async listener bus has delivered
  * every queued event. `SparkListener` callbacks run asynchronously,
  * so a shuffle-byte counter read right after an action can miss (or
  * mis-attribute to the next pass) the final stage-completion events —
  * draining before each read/reset makes per-pass accounting exact.
  * Lives in the spark namespace because `listenerBus` is
  * `private[spark]`. Used only by `graft.tools` measurement mains,
  * never by the library. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
