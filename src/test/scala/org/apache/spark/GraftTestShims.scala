package org.apache.spark

/** Test-tree bridge into `private[spark]` scheduler internals: the
  * runtime job/stage budget sweep (QueriesSmokeSpec) must flush the
  * async listener bus before reading its counters, and
  * `SparkContext.listenerBus` is package-private. Spark's own test
  * suites flush the same way; there is no public equivalent. */
object GraftTestShims {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
