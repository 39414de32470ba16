package graft

import graft.queries.{EventOps, LearnOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10n evaluation-hygiene operators: the gains
  * table's conservation and capture laws, SRM's null reading on a
  * parity assignment, MDE's closed form, and the backtest folds'
  * temporal-ordering guarantees. */
class R10nOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_gains -----------------------------------------------------------

  test("gains: users and positives conserved, capture monotone to 1.0, " +
      "weighted lift averages to 1") {
    val rows = LearnOps.qGains(spark, sf)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
      .sortBy(-_._1)
    assert(rows.nonEmpty)
    val nUsers = Tables.df(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers)
    val cap = rows.map(_._6)
    assert(cap.sliding(2).forall(p => p.head <= p.last + 1e-9),
      "cumulative capture grows as deciles are added top-down")
    assert(math.abs(cap.last - 1.0) < 1e-6,
      "all deciles together capture every converter")
    val nAll = rows.map(_._2).sum.toDouble
    val wLift = rows.map(r => r._5 * r._2).sum / nAll
    assert(math.abs(wLift - 1.0) < 0.05,
      s"population-weighted lift must average ~1: $wLift")
  }

  // ---- q_srm / q_mde -----------------------------------------------------

  test("srm: parity split balances (pinned null reading) and z matches " +
      "the closed form") {
    val r = EventOps.qSrm(spark, sf)
      .as[(Long, Long, Double, Double, Boolean)].head()
    val (na, nb, ratio, z, flag) = r
    assert(na + nb == Tables.df(spark, sf, "events")
      .select($"user_id").distinct().count())
    assert(math.abs(ratio - na.toDouble / (na + nb)) < 1e-6)
    assert(math.abs(z - (na - nb).toDouble / math.sqrt((na + nb).toDouble))
      < 1e-5)
    assert(!flag, "a parity assignment cannot produce an SRM")
  }

  test("mde: closed form replays and shrinks with sample size") {
    val r = EventOps.qMde(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    val (na, nb, p, mdeAbs, mdeRel) = r
    assert(p > 0.0 && p < 1.0)
    val want = (1.959964 + 0.841621) *
      math.sqrt(2.0 * p * (1 - p) / ((na + nb).toDouble / 2))
    assert(math.abs(mdeAbs - want) < 1e-4)
    assert(math.abs(mdeRel - mdeAbs / p) < 1e-4)
    assert(mdeAbs > 0.0 && mdeAbs < 1.0)
  }

  // ---- q_backtest_folds --------------------------------------------------

  test("backtest folds: train grows with the origin, test windows are " +
      "disjoint from train, sizes consistent with the raw stream") {
    val rows = EventOps.qBacktestFolds(spark, sf)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val train = rows.map(_._2)
    assert(train.sliding(2).forall(p => p.head <= p.last),
      "a later origin can only see more training data")
    val total = Tables.df(spark, sf, "events").count()
    rows.foreach { case (_, nTr, nTe, trRate, _) =>
      assert(nTr + nTe <= total)
      assert(nTr > 0 && trRate > 0.0 && trRate < 1.0)
    }
    // fold 3 trains on 5/8 of the range: must hold a majority of rows
    // under the fixture's roughly uniform event arrivals
    assert(train.last > total / 2,
      s"5/8-origin train fold too small: ${train.last} of $total")
  }
}
