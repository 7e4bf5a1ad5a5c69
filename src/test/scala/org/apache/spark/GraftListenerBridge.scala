package org.apache.spark

/** Test-scope bridge to `SparkContext.listenerBus` (`private[spark]`):
  * a deterministic listener drain for specs that count SQL-execution
  * events. Replaces the previous reflective lookup + `Thread.sleep`
  * fallback — the same extension-library technique as
  * [[org.apache.spark.sql.GraftColumnBridge]]. */
object GraftListenerBridge {
  /** Block until every event posted so far has been delivered to all
    * registered listeners. */
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
