package graft

import graft.streaming.Streams
import graft.streaming.Streams.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** transformWithState (StatefulProcessor) semantics: per-key ValueState
  * accumulates across micro-batches under the RocksDB state store. */
class TransformWithStateSpec extends SparkSpec {

  private def ev(uid: Long, t: String) = UserEvent(uid, Timestamp.valueOf(t))

  test("ValueState running count accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = Streams.runningCountsTws(input.toDS())
      .writeStream.format("memory").queryName("tws_counts")
      .outputMode("update").start()
    try {
      input.addData(ev(1, "2024-01-01 00:00:01"), ev(1, "2024-01-01 00:00:02"),
        ev(2, "2024-01-01 00:00:03"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 00:01:00"))
      q.processAllAvailable()
      val byBatchMax = spark.table("tws_counts")
        .groupBy($"user_id").max("n_events").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byBatchMax(1L) === 3, s"state must carry across batches: $byBatchMax")
      assert(byBatchMax(2L) === 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
