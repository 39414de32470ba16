package graft

import graft.queries.{CorpusOps, EventOps}
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Properties of the round-10o monitoring operators: the windowed PSI's
  * self-consistency (a window equal to the reference half reads near
  * zero), MATTR's bounds vs raw TTR, and the streaming twin equality —
  * the micro-batch windowed bin counts produce the exact batch PSI. */
class R10oOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_drift_window ----------------------------------------------------

  test("drift window: windows partition the stream and early windows " +
      "(inside the reference half) read low PSI") {
    val rows = EventOps.qDriftWindow(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == Tables.df(spark, sf, "events").count())
    rows.foreach { case (wk, ws, _, psi, drift) =>
      assert(ws == wk * 259200L)
      assert(psi >= -1e-9, "smoothed PSI is non-negative up to rounding")
      assert(drift == (psi > 0.2))
    }
    // the first window sits wholly inside the reference period: its
    // distribution was part of the reference fit, so PSI must be small
    assert(rows.head._4 < 0.2,
      s"first (in-reference) window must not alarm: ${rows.head}")
  }

  // ---- q_mattr -----------------------------------------------------------

  test("mattr: bounded in (0,1], and above raw TTR on long docs (the " +
      "length-confound correction working)") {
    val rows = CorpusOps.qMattr(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum ==
      Tables.df(spark, sf, "documents").count())
    rows.foreach { case (_, _, mattr, raw) =>
      assert(mattr > 0.0 && mattr <= 1.0)
      assert(raw > 0.0 && raw <= 1.0)
      // raw TTR of a 31-type vocabulary collapses on long docs; the
      // 20-token window cannot collapse below ~distinct-in-20
      assert(mattr >= raw - 1e-9,
        s"windowed TTR must not undershoot whole-doc TTR here: " +
          s"$mattr vs $raw")
    }
  }

  // ---- streaming twin ----------------------------------------------------

  test("drift stream: windowed bin counts across two micro-batches " +
      "reproduce the batch PSI exactly") {
    implicit val sqlCtx = spark.sqlContext
    val (cuts, refShares) = EventOps.driftRef(spark, sf)
    val cutsCk = cuts.localCheckpoint()
    val refCk = refShares.localCheckpoint()
    val all = Tables.df(spark, sf, "events")
      .select($"ts".cast("timestamp").as[Timestamp],
        $"value".as[Double]).collect().toSeq
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Timestamp, Double)]
    val q = Streams.driftBinCountsStream(
        input.toDF().toDF("ts", "value"), cutsCk)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val got = spark.table("drift_stream")
        .withColumn("wk", expr("unix_micros(cast(w.start as timestamp))" +
          " div 259200000000"))
        .crossJoin(broadcast(refCk))
        .select($"wk", round(EventOps.driftPsi(spark), 6).as("psi"))
        .as[(Long, Double)].collect().toMap
      val want = EventOps.qDriftWindow(spark, sf)
        .select($"wk", $"psi").as[(Long, Double)].collect().toMap
      assert(got == want,
        s"stream PSI ${got.toSeq.sorted} vs batch ${want.toSeq.sorted}")
    } finally q.stop()
  }
}
