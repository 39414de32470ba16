package graft

import java.sql.Timestamp

import graft.queries.{CurateOps, SketchOps, TextOps}
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

  test("curation e2e: per-stage counts reconcile with the standalone " +
      "gates (quality, canonical survivorship, decontaminate, split)") {
    val e2e = CurateOps.qCurationE2e(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // recompute every gate from the STANDALONE registered ops' outputs —
    // the funnel must be their composition, not a parallel re-derivation
    val flags = TextOps.qQuality(spark, sf)
      .filter($"doc_id" % 10 === 0).select($"doc_id", $"score")
      .join(CurateOps.qCanonical(spark, sf).select($"doc_id", $"keep"),
        "doc_id")
      .join(TextOps.qDecontaminate(spark, sf), Seq("doc_id"), "left")
      .join(CurateOps.qSplitLeakproof(spark, sf)
        .select($"doc_id", $"split"), "doc_id")
      .select($"doc_id", ($"score" >= 0.5).as("g1"), $"keep",
        coalesce($"contaminated", lit(false)).as("cont"),
        ($"doc_id" % 97 === 0).as("bench"), $"split")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)].collect()
    val n0 = flags.length.toLong
    val k1 = flags.count(_._2).toLong
    val g2 = flags.filter(f => f._2 && f._3)
    val g3 = g2.filter(f => !f._4 && !f._5)
    assert(e2e("0_subset") == ((n0, n0)))
    assert(e2e("1_quality") == ((n0, k1)))
    assert(e2e("2_near_dup") == ((k1, g2.length.toLong)))
    assert(e2e("3_decontam") == ((g2.length.toLong, g3.length.toLong)))
    for (s <- Seq("train", "val", "test"))
      assert(e2e(s"4_split_$s") ==
        ((g3.length.toLong, g3.count(_._6 == s).toLong)),
        s"split $s partition must match the standalone split op")
    // the split rows partition the final survivors exactly
    assert(Seq("train", "val", "test").map(s => e2e(s"4_split_$s")._2).sum
      == g3.length.toLong)
    // a funnel that never drops anything tests nothing: the near-dup
    // gate must fire (the fixture plants near-duplicates) and the whole
    // funnel must show attrition. The quality and decontamination gates
    // only bite from sf0.01 up (at sf0.001 all 50 subset docs score
    // >= 0.5 and none shares a 5-gram with the benchmark docs) — the
    // sf0.01 driver run plus the hash oracle cover those.
    assert(g2.length < k1, "the near-dup gate must drop something")
    assert(g3.length < n0, "the funnel must show attrition end to end")
  }
}
