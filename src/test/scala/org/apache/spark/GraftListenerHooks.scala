package org.apache.spark

/** Test-only bridge to the private[spark] listener bus: the
  * construction-job audits count jobs via a SparkListener and must
  * drain the async bus before asserting, or a just-submitted job's
  * event could land after the assertion reads the counter.
  */
object GraftListenerHooks {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
