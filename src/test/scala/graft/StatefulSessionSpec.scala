package graft

import graft.streaming.Streams
import graft.streaming.Streams.{UserEvent, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulSessionSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts").as[UserEvent]
    val sessions = Streams.statefulSessionize(events,
      gapMs = 10 * 60 * 1000, lateness = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one session: two events 5 min apart
      input.addData((1L, ts("2024-01-01 00:00:00")),
        (1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0, "session still open")

      // event 55 min later → closes session 1 inline, opens session 2
      input.addData((1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val s1 = spark.table("sess_out").as[UserSession].collect()
      assert(s1.length === 1)
      assert(s1.head.n_events === 2)
      assert(s1.head.s_start === ts("2024-01-01 00:00:00"))
      assert(s1.head.s_end === ts("2024-01-01 00:15:00"))

      // another user far in the future pushes the watermark past
      // session 2's gap → session 2 emitted by timeout
      input.addData((2L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 05:00:01")))
      q.processAllAvailable()
      val users = spark.table("sess_out").as[UserSession].collect()
        .map(_.user_id).toSet
      assert(users.contains(1L))
      val s2 = spark.table("sess_out").as[UserSession].collect()
        .filter(s => s.user_id == 1L && s.n_events == 1)
      assert(s2.length === 1, "timed-out session must be emitted exactly once")
      assert(s2.head.s_end === ts("2024-01-01 01:10:00"))
    } finally q.stop()
  }

  test("late-but-in-horizon event extends the open session backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts").as[UserEvent]
    val sessions = Streams.statefulSessionize(events,
      gapMs = 10 * 60 * 1000, lateness = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // late event BEFORE the open session's start, within the watermark
      // and the gap → must lower s_start, not leave it at 00:10
      input.addData((1L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      // close the session by gap
      input.addData((1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      val s = spark.table("sess_late").as[UserSession].collect()
        .filter(_.n_events == 2)
      assert(s.length === 1, spark.table("sess_late").collect().mkString(","))
      assert(s.head.s_start === ts("2024-01-01 00:05:00"),
        "session start must extend backwards for late events")
    } finally q.stop()
  }

  test("batch mode emits every session including each key's final one") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
      (1L, ts("2024-01-01 01:00:00")), // > gap later: second session
      (2L, ts("2024-01-01 02:00:00"))
    ).toDF("user_id", "ts").as[Streams.UserEvent]
    val sessions = Streams.statefulSessionize(events,
      gapMs = 10 * 60 * 1000, lateness = "5 minutes").collect()
    // batch input is complete: open sessions must flush, not vanish
    assert(sessions.length === 3, sessions.mkString(","))
    val u1 = sessions.filter(_.user_id == 1L).sortBy(_.s_start.getTime)
    assert(u1.map(_.n_events).toSeq === Seq(2, 1))
    assert(u1(0).s_end === ts("2024-01-01 00:15:00"))
    assert(sessions.count(_.user_id == 2L) === 1)
  }

  test("a straggler more than a gap before the session stays separate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts").as[UserEvent]
    val sessions = Streams.statefulSessionize(events,
      gapMs = 10 * 60 * 1000, lateness = "60 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_detached")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // 20 minutes BEFORE the open session with a 10-minute gap → must NOT
      // merge (that would fabricate one [00:40, 01:10) session)
      input.addData((1L, ts("2024-01-01 00:40:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 03:00:00"))) // closes [01:00,...]
      q.processAllAvailable()
      val s = spark.table("sess_detached").as[UserSession].collect()
        .sortBy(_.s_start.getTime)
      assert(s.length === 2, s.mkString(","))
      assert(s(0).s_start === ts("2024-01-01 00:40:00") && s(0).n_events === 1)
      assert(s(1).s_start === ts("2024-01-01 01:00:00") && s(1).n_events === 1)
    } finally q.stop()
  }
}
