package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream inner join with watermarked time bounds — the two-sided
  * stateful join (both sides buffer rows until the watermark passes the
  * join window). No Hive counterpart; pure Structured Streaming surface. */
class StreamStreamJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream join matches events within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val clickDf = clicks.toDF().toDF("user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val viewDf = views.toDF().toDF("v_user", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    // view must precede the click by at most 30 minutes
    val joined = clickDf.join(viewDf,
      expr("""user_id = v_user AND
             |view_ts <= click_ts AND
             |view_ts >= click_ts - INTERVAL 30 MINUTES""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 00:00:00")),   // in-window for click at 00:20
        (1L, ts("2024-01-01 02:00:00")),   // after the click: no match
        (2L, ts("2024-01-01 00:00:00")))   // different user's click window
      clicks.addData(
        (1L, ts("2024-01-01 00:20:00")),
        (2L, ts("2024-01-01 01:00:00")))   // view 1h earlier: out of window
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select($"user_id", $"view_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString))
      assert(rows.toSet === Set((1L, "2024-01-01 00:00:00.0")),
        s"got ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("stream-static join enriches every micro-batch from the dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the everyday enrichment pattern: an unbounded fact stream joined to
    // a bounded dimension — Spark broadcasts/rescans the static side per
    // micro-batch, no state store involved, left rows always pass through
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val facts = MemoryStream[(Long, Double)]
    val enriched = facts.toDF().toDF("user_id", "amount")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select($"user_id", $"amount", coalesce($"tier", lit("none")).as("tier"))
    val q = enriched.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    try {
      facts.addData((1L, 10.0), (3L, 7.5))
      q.processAllAvailable()
      facts.addData((2L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("ss_enrich").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows === Set((1L, 10.0, "gold"), (3L, 7.5, "none"),
        (2L, 4.0, "silver")), s"got $rows")
    } finally q.stop()
  }
}
