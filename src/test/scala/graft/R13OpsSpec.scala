package graft

import java.sql.Timestamp

import graft.queries.SketchOps
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-13 batch invariants, starting with the HLL streaming twin's
  * merge law — the last sketch in the family to gain a batch/stream
  * symmetry proof (the CMS/DDSketch precedent, but with MAX-merge
  * instead of SUM-merge: HLL registers merge by register-wise max). */
class R13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hll stream: register-max across windows equals the one-pass " +
      "batch registers of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.df(spark, sf, "events")
      .select($"ts".cast("timestamp").as[Timestamp],
        $"user_id".cast("string").as[String])
      .collect().toSeq
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Timestamp, String)]
    val q = Streams.hllStream(input.toDF().toDF("ts", "item"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // the HLL merge is register-wise MAX (idempotent — a bucket seen
      // in many windows keeps its largest rho), not the CMS's sum
      val merged = spark.table("hll_stream")
        .groupBy($"bucket").agg(max($"m_j").as("m_j"))
        .as[(Long, Int)].collect().toMap
      val batch = SketchOps.hllRegs(
          Tables.df(spark, sf, "events")
            .select($"user_id".cast("string").as("tok")))
        .as[(Long, Int)].collect().toMap
      assert(merged == batch,
        s"stream-merged HLL registers (${merged.size}) must equal the " +
          s"batch registers (${batch.size})")
      // a real sketch, not a degenerate one: multiple buckets occupied
      // (sf0.001's ~50 distinct users land in ~15 of the 256 buckets)
      assert(batch.size > 4 && batch.size <= 256)
    } finally q.stop()
  }
}
