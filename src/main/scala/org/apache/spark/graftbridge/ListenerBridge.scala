package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; benchmark telemetry
  * needs `waitUntilEmpty()` so a per-query TaskMetrics snapshot is taken
  * only after every task-end event of that query has been delivered
  * (the listener bus is async — without the flush, a query's last tasks
  * can be attributed to the NEXT query). This one-method shim is the
  * narrowest possible use of the spark-private namespace; nothing else
  * in the repo reaches into it.
  */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
