package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Watermark / late-data semantics that the batch oracle cannot observe:
  * driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark drops events later than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.tumblingWithWatermark(df, "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling_wm")
      .outputMode("update").start()
    try {
      // batch 1: two events in the 00:00 window; watermark advances to 00:50
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:02:00"), "a", 2.0),
        (ts("2024-01-01 01:00:00"), "b", 3.0))
      q.processAllAvailable()
      // batch 2: an event 2 hours late — beyond the 10-minute watermark →
      // must be dropped, the 00:00 window must NOT change
      input.addData((ts("2024-01-01 00:03:00"), "a", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_wm")
        .filter($"event_type" === "a").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("n") === 2, "late event must be dropped")
    } finally q.stop()
  }

  test("late-but-within-watermark events still update their window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.tumblingWithWatermark(df, "5 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling_wm2")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:20:00"), "b", 3.0))
      q.processAllAvailable()
      // 19 minutes late but within the 30-minute watermark → accepted
      input.addData((ts("2024-01-01 00:02:00"), "a", 4.0))
      q.processAllAvailable()
      val n = spark.table("tumbling_wm2").filter($"event_type" === "a")
        .orderBy($"n".desc).head().getAs[Long]("n")
      assert(n === 2, "in-horizon late event must be aggregated")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("event_id", "ts", "event_type")
    val out = Streams.dedupWithinWatermark(df, "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:01:00"), "a"),
        (1L, ts("2024-01-01 00:01:30"), "a"),
        (2L, ts("2024-01-01 00:02:00"), "b"))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 00:03:00"), "a"))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm").select($"event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L))
    } finally q.stop()
  }

  test("streaming session_window aggregates merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val q = Streams.sessionize(df.withWatermark("ts", "10 minutes"),
        "10 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:05:00"), 1L, 2.0),   // same session (5m gap)
        (ts("2024-01-01 01:00:00"), 1L, 3.0))   // new session
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .orderBy($"s_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 2)
      assert(rows(1).getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch twin on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 00:01:00"), "a", 1.0),
      (ts("2024-01-01 00:04:00"), "a", 2.0),
      (ts("2024-01-01 00:06:00"), "a", 3.0),
      (ts("2024-01-01 00:07:00"), "b", 4.0))
    val input = MemoryStream[(Timestamp, String, Double)]
    val sdf = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.tumblingCounts(sdf, "5 minutes")
      .writeStream.format("memory").queryName("tumbling_eq")
      .outputMode("complete").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streaming = spark.table("tumbling_eq")
        .orderBy($"w_start", $"event_type").collect().toSeq
      val batch = Streams.tumblingCounts(
        data.toDF("ts", "event_type", "value"), "5 minutes")
        .orderBy($"w_start", $"event_type").collect().toSeq
      assert(streaming.map(_.toString) === batch.map(_.toString))
    } finally q.stop()
  }
}
