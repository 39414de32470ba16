package graft

import graft.operators.Dedup
import graft.queries.{CurateOps, SketchOps}
import org.apache.spark.sql.functions._

/** Round-11 operator properties: the winnowing guarantee (shared runs ≥
  * w+k−1 tokens ⇒ a shared fingerprint, shift-invariant under prefix
  * edits), the DDSketch relative-error bound, and the sign-hash AMS
  * join-size estimator's fixture accuracy. */
class R11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing: prefix edit keeps shared fingerprints (shift " +
      "invariance) and identical docs share every fingerprint") {
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "inserted prefix words here " + body), // shifted copy
      (3L, "completely different content with no overlap at all xyz")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 4, w = 5)
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        id -> rows.map(_.getLong(1)).toSet }
    // the 30-token shared run >> w+k-1 = 8 must yield shared fingerprints
    val shared12 = fps(1L).intersect(fps(2L))
    assert(shared12.nonEmpty,
      "a 30-token shared run must survive a prefix insertion")
    // winnowing guarantee quantitatively: most of doc 1's fingerprints
    // re-occur in the shifted copy (only window-boundary ones may differ)
    assert(shared12.size >= fps(1L).size / 2,
      s"${shared12.size} of ${fps(1L).size} fingerprints survived the shift")
    assert(fps(1L).intersect(fps(3L)).isEmpty,
      "disjoint content must share no fingerprints")
  }

  test("q_dedup_winnow: pairs are well-formed and overlap bounded") {
    val rows = CurateOps.qDedupWinnow(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "id1 < id2")
      val shared = r.getLong(4)
      assert(shared <= math.min(r.getLong(2), r.getLong(3)),
        "shared fps cannot exceed either set size")
      val ov = r.getDouble(5)
      assert(ov >= 0.5 && ov <= 1.0)
    }
  }

  test("ddsketch: every estimate within the gamma relative-error bound") {
    // alpha = (1.02-1)/(1.02+1) ~ 0.0099; interpolation slack because the
    // exact side is percentile_cont while the sketch targets rank-ceil
    val rows = SketchOps.qDdsketch(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val relErr = r.getDouble(5)
      assert(relErr <= 0.0099 + 0.003,
        s"q=${r.getDouble(0)} rel_err $relErr exceeds the DDSketch bound")
    }
  }

  test("join cardest: sign-hash AMS estimate lands near truth and the " +
      "self-join estimate is non-negative") {
    val rows = SketchOps.qJoinCardest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (exSelf, estSelf) = rows("lineitem_selfjoin_partkey")
    assert(estSelf >= 0, "sum of squares is non-negative")
    assert(exSelf > 0)
    // 1024 buckets over ~2k keys: fixture inflation stays within 2x
    assert(estSelf.toDouble / exSelf > 0.3 && estSelf.toDouble / exSelf < 3.0,
      s"self-join est $estSelf vs exact $exSelf")
  }
}
