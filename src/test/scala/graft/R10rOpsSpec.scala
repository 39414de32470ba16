package graft

import graft.queries.{StatsOps, VectorQueries}
import org.apache.spark.sql.functions._

/** Properties of the round-10r operators: media dedup's conservation
  * laws (exact groups refine near-dup buckets), and covariate-shift
  * weights' normalization/ESS identities with the pinned stable-stream
  * reading. */
class R10rOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_media_dedup -----------------------------------------------------

  test("media dedup: payload counts conserved, exact groups refine the " +
      "signature buckets, planted dup payloads detected") {
    val r = VectorQueries.qMediaDedup(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (groups, nMedia, exactDups, buckets, maxBucket, nearPairs) = r
    val nDocs = Tables.df(spark, sf, "documents").count()
    assert(nMedia == nDocs)
    assert(groups + exactDups == nMedia,
      "every payload is one group representative or one duplicate")
    // pinned fixture reading: the planted duplicates are NEAR-dups
    // (shingle-level containment), never byte-identical payloads — so
    // exact dedup finds nothing while the signature buckets DO collide;
    // exactly the gap a perceptual signature exists to close
    assert(exactDups == 0,
      s"fixture has no byte-identical payloads (got $exactDups dups) — " +
        "if this fires the fixture gained exact copies")
    assert(groups == nMedia)
    // identical payloads share the identical decoded signature, so
    // signature buckets can never outnumber exact groups
    assert(buckets <= groups)
    assert(maxBucket >= 2 && nearPairs > 0,
      "the near-dup signature must produce candidate pairs here")
  }

  // ---- q_cov_shift -------------------------------------------------------

  test("cov shift: bins partition both halves, weights near 1 on a " +
      "distribution-stable stream (pinned), ESS identities hold") {
    val rows = StatsOps.qCovShift(spark, sf)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = Tables.df(spark, sf, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == total)
    rows.foreach { case (bin, _, _, w, _, _) =>
      assert(bin >= 1 && bin <= 10)
      assert(w > 0.0)
    }
    // the fixture's value distribution is time-stationary: weights stay
    // near 1 and the reweighted history keeps most of its sample
    assert(rows.forall(r => r._4 > 0.5 && r._4 < 2.0),
      s"stationary stream must not need extreme weights: " +
        s"${rows.map(_._4).toSeq}")
    val essRatio = rows.head._6
    assert(rows.forall(_._6 == essRatio))
    assert(essRatio > 0.8 && essRatio <= 1.0 + 1e-6,
      s"near-unit weights keep the effective sample size: $essRatio")
    // ESS recomputation from the reported bins
    val n1 = rows.map(_._2).sum.toDouble
    val sw = rows.map(r => r._2 * r._4).sum
    val sw2 = rows.map(r => r._2 * r._4 * r._4).sum
    assert(math.abs(rows.head._5 - sw * sw / sw2) < 1.0)
    assert(math.abs(essRatio - rows.head._5 / n1) < 1e-3)
  }
}
