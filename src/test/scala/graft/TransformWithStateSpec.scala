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

  test("state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_ckpt").toString
    val input = MemoryStream[UserEvent]
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // fault-tolerant sink shape a production restart actually uses
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def start() = Streams.runningCountsTws(input.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[_], _: Long) =>
        batch.toDF().collect().foreach(r =>
          seen.synchronized { seen += ((r.getLong(0), r.getLong(1))) })
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    val q1 = start()
    try {
      input.addData(ev(1, "2024-01-01 00:00:01"), ev(1, "2024-01-01 00:00:02"))
      q1.processAllAvailable()
    } finally q1.stop()
    // a NEW query over the same source resumes from the checkpoint: the
    // RocksDB state (count=2 for user 1) must carry into the next batch,
    // the fault-tolerance contract a production restart depends on
    val q2 = start()
    try {
      input.addData(ev(1, "2024-01-01 00:01:00"))
      q2.processAllAvailable()
      val n = seen.synchronized {
        seen.filter(_._1 == 1L).map(_._2).max
      }
      assert(n === 3, s"restart must resume the running count, got $seen")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("event-time timers close sessions when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
      .as[graft.streaming.Streams.UserEvent]
    val q = Streams.sessionizeTws(events,
        gapMs = 10 * 60 * 1000, lateness = "5 minutes")
      .writeStream.format("memory").queryName("tws_sess")
      .outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      input.addData((1L, ts("2024-01-01 00:00:00")),
        (1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      assert(spark.table("tws_sess").count() === 0, "session still open")
      // a far-future event for another user pushes the watermark past
      // session 1's gap → its TIMER fires and emits the session
      input.addData((2L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 05:00:01")))
      q.processAllAvailable()
      val s1 = spark.table("tws_sess")
        .as[graft.streaming.Streams.UserSession].collect()
        .filter(_.user_id == 1L)
      assert(s1.length === 1, s"timer must emit exactly once: ${s1.toSeq}")
      assert(s1.head.n_events === 2)
      assert(s1.head.s_start === ts("2024-01-01 00:00:00"))
      assert(s1.head.s_end === ts("2024-01-01 00:15:00"))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("running-moment anomaly detector warms up, then flags the spike") {
    import spark.implicits._
    import graft.streaming.Streams.{Anomaly, TypedPoint}
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def pt(s: Int, v: Double) =
      TypedPoint("api", Timestamp.valueOf(f"2024-01-01 00:00:$s%02d"), v)
    val input = MemoryStream[TypedPoint]
    val q = Streams.anomaliesTws(input.toDS(), minN = 5, zCut = 3.0)
      .writeStream.format("memory").queryName("tws_anom")
      .outputMode("update").start()
    try {
      // batch 1: ten calm points (incl. during warm-up) — nothing flagged
      input.addData((1 to 10).map(i => pt(i, 10.0 + (i % 3))): _*)
      q.processAllAvailable()
      assert(spark.table("tws_anom").count() === 0,
        "warm-up + in-band points must not alert")
      // batch 2: a spike, scored against the moments carried in state
      input.addData(pt(20, 1000.0), pt(21, 10.5))
      q.processAllAvailable()
      val hits = spark.table("tws_anom").as[Anomaly].collect()
      assert(hits.length === 1, s"exactly the spike alerts: ${hits.toSeq}")
      assert(hits.head.v === 1000.0 && hits.head.n_seen === 10)
      assert(hits.head.z > 3.0)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
