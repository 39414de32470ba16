package graft

import graft.queries.EventOps
import org.apache.spark.sql.functions._

/** Properties of the round-10t experimentation operators: CUPED's
  * unbiasedness-and-variance laws on the parity null, and the QTE
  * table's quantile identities. */
class R10tOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_cuped -----------------------------------------------------------

  test("cuped: adjustment reduces variance, keeps the (null) contrast " +
      "near zero, and theta matches the moment formula") {
    val r = EventOps.qCuped(spark, sf)
      .as[(Long, Double, Double, Double, Option[Double])].head()
    val (nUsers, theta, diffRaw, diffAdj, vr) = r
    assert(nUsers == Tables.df(spark, sf, "events")
      .select($"user_id").distinct().count())
    vr.foreach { v =>
      assert(v >= -1e-6 && v < 1.0,
        s"CUPED with the OLS theta cannot increase variance: $v")
    }
    // parity is a true null: both contrasts should be small relative to
    // the outcome scale (second-half purchase counts, mean of a few)
    assert(math.abs(diffRaw) < 3.0 && math.abs(diffAdj) < 3.0)
    // theta from first principles
    val users = Tables.df(spark, sf, "events")
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_type").collect()
    val mid = {
      val uss = users.map(_.getLong(1))
      (uss.min + uss.max) / 2
    }
    // .toSeq BEFORE mapping: Map.map over pair results would rebuild a
    // Map and silently dedupe users with equal pre-counts
    val byU = users.groupBy(_.getLong(0)).toSeq.map { case (_, rs) =>
      (rs.count(_.getLong(1) < mid).toDouble,
        rs.count(r => r.getLong(1) >= mid &&
          r.getString(2) == "purchase").toDouble)
    }
    val n = byU.size.toDouble
    val (sp, sy) = (byU.map(_._1).sum, byU.map(_._2).sum)
    val spy = byU.map(p => p._1 * p._2).sum
    val spp = byU.map(p => p._1 * p._1).sum
    val want = (spy - sp * sy / n) / (spp - sp * sp / n)
    assert(math.abs(theta - want) < 1e-4, s"theta $theta vs $want")
  }

  // ---- q_qte -------------------------------------------------------------

  test("qte: per-decile quantiles are monotone within each arm and the " +
      "difference column is consistent") {
    val rows = EventOps.qQte(spark, sf)
      .as[(Int, Int, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 9))
    val va = rows.map(_._5)
    val vb = rows.map(_._6)
    assert(va.sliding(2).forall(p => p.head <= p.last + 1e-9))
    assert(vb.sliding(2).forall(p => p.head <= p.last + 1e-9))
    rows.foreach { case (_, pct, na, nb, a, b, qte) =>
      assert(pct % 10 == 0 && na > 0 && nb > 0)
      assert(math.abs(qte - BigDecimal(a - b).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // parity arms draw from the same purchase-value distribution, so
    // every QTE should be small relative to the value scale
    val scale = va.max
    assert(rows.forall(r => math.abs(r._7) < 0.5 * scale),
      s"null experiment must not show large quantile shifts")
  }
}
