package graft

import java.sql.Timestamp

import graft.queries.{Analytics, GovernOps, SketchOps}
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-11 fourth batch: the expectation suite's pass semantics, the
  * stickiness containment law, and the streaming DDSketch merge law
  * (windowed stream buckets sum to the one-pass batch sketch). */
class R11dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("expectations: every contract check passes on the fixture and " +
      "pass replays from observed vs threshold") {
    val rows = GovernOps.qExpectations(spark, sf).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val name = r.getString(0)
      val obs = r.getLong(1); val thr = r.getLong(2)
      val pass = r.getBoolean(3)
      val expected =
        if (name == "lineitem.row_count_min") obs >= thr else obs == thr
      assert(pass == expected, s"$name pass flag vs replay")
      assert(pass, s"fixture must satisfy its own contract: $name")
    }
  }

  test("stickiness: dau <= wau <= mau and ratio replays") {
    val rows = Analytics.qStickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dau = r.getLong(1); val wau = r.getLong(2); val mau = r.getLong(3)
      assert(dau >= 1 && dau <= wau && wau <= mau,
        s"containment $dau/$wau/$mau")
      assert(math.abs(r.getDouble(4) - dau.toDouble / mau) < 1e-6)
    }
  }

  test("ddsketch stream: merged window buckets equal the one-pass batch " +
      "sketch of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.df(spark, sf, "events")
      .select($"ts".cast("timestamp").as[Timestamp], $"value".as[Double])
      .collect().toSeq
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Timestamp, Double)]
    val q = Streams.ddsketchStream(input.toDF().toDF("ts", "value"))
      .writeStream.format("memory").queryName("dd_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val merged = spark.table("dd_stream")
        .groupBy($"b").agg(sum($"cnt").as("cnt"))
        .as[(Long, Long)].collect().toMap
      val batch = Tables.df(spark, sf, "events")
        .select(SketchOps.ddBucket($"value".cast("double")).as("b"))
        .groupBy($"b").agg(count(lit(1)).as("cnt"))
        .as[(Long, Long)].collect().toMap
      assert(merged == batch,
        s"stream-merged sketch (${merged.size} buckets) must equal the " +
          s"batch sketch (${batch.size})")
    } finally q.stop()
  }
}
