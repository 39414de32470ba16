package graft

import graft.queries.{EventOps, GovernOps, StatsOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10q robust-statistics operators: Holm's
  * monotonicity and dominance over raw p-values, the changepoint scan
  * replayed brute-force, and Theil–Sen's breakdown robustness vs OLS
  * on a contaminated copy of the series. */
class R10qOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_holm ------------------------------------------------------------

  test("holm: adjusted p monotone non-decreasing in rank, dominates the " +
      "raw p, rejections form a prefix") {
    val rows = GovernOps.qHolm(spark, sf)
      .as[(String, String, Double, Int, Double, Boolean)].collect()
      .sortBy(_._4)
    assert(rows.nonEmpty)
    val m = rows.length
    rows.foreach { case (_, _, p, rk, adj, rej) =>
      assert(adj >= p - 1e-9, "Holm can only inflate a p-value")
      assert(adj <= 1.0 + 1e-9)
      assert(rej == (adj < 0.05))
      // step-down factor at this rank bounds the adjustment from below
      assert(adj >= math.min(1.0, (m - rk + 1) * p) - 1e-6)
    }
    val adj = rows.map(_._5)
    assert(adj.sliding(2).forall(p => p.head <= p.last + 1e-9),
      "running max makes adjusted p monotone in rank")
    val rej = rows.map(_._6)
    assert(!rej.sliding(2).exists(w => !w.head && w.last),
      "rejections are a prefix of the rank order")
  }

  // ---- q_changepoint -----------------------------------------------------

  test("changepoint: scan statistic and argmax match brute force, " +
      "means reconstruct the total") {
    val r = EventOps.qChangepoint(spark, sf)
      .as[(String, Long, Double, Double, Option[Double])].head()
    val (cpDay, nDays, gMax, mb, ma) = r
    val daily = Tables.df(spark, sf, "events")
      .groupBy(to_date($"ts").cast("string").as("d"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long)].collect().sortBy(_._1)
    assert(nDays == daily.length)
    val sn = daily.map(_._2).sum
    var st = 0L
    val gs = daily.zipWithIndex.map { case ((d, x), i) =>
      st += x
      (d, math.abs(st.toDouble - (i + 1).toDouble * sn / nDays))
    }
    val want = gs.maxBy(g => (g._2, -g._1.hashCode))
    val wantDay = gs.filter(_._2 >= want._2 - 1e-9).minBy(_._1)
    assert(cpDay == wantDay._1, s"argmax day $cpDay vs ${wantDay._1}")
    assert(math.abs(gMax - wantDay._2) < 1e-4)
    val t = daily.indexWhere(_._1 == cpDay) + 1
    val before = daily.take(t).map(_._2).sum
    assert(math.abs(mb - before.toDouble / t) < 1e-4)
    ma.foreach { a =>
      assert(math.abs(a - (sn - before).toDouble / (nDays - t)) < 1e-4)
    }
  }

  // ---- q_theil_sen -------------------------------------------------------

  test("theil-sen: matches a brute-force median-of-slopes, and resists " +
      "an injected outlier that drags OLS") {
    val r = StatsOps.qTheilSen(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    val (nDays, nPairs, slope, intercept, olsSlope) = r
    assert(nPairs == nDays * (nDays - 1) / 2)
    val daily = Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("x"))
      .orderBy($"d")
      .select($"x").as[Double].collect()
    val ts = daily.indices.map(_.toDouble).zip(daily)
    def median(a: Seq[Double]): Double = {
      val s = a.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val slopes = for {
      i <- ts.indices; j <- (i + 1) until ts.size
    } yield BigDecimal((ts(j)._2 - ts(i)._2) / (ts(j)._1 - ts(i)._1))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(slope - median(slopes)) < 1e-4,
      s"TS slope $slope vs brute ${median(slopes)}")
    // robustness: corrupt ONE day by 100x; OLS slope moves far more
    // than the TS slope recomputed on the corrupted series
    val bad = daily.updated(daily.length / 2, daily.max * 100)
    val ts2 = bad.indices.map(_.toDouble).zip(bad)
    val slopes2 = for {
      i <- ts2.indices; j <- (i + 1) until ts2.size
    } yield (ts2(j)._2 - ts2(i)._2) / (ts2(j)._1 - ts2(i)._1)
    val tsMoved = math.abs(median(slopes2.map(x => x)) - slope)
    val n = bad.length.toDouble
    val (sx, sy) = (ts2.map(_._1).sum, ts2.map(_._2).sum)
    val sxy = ts2.map(p => p._1 * p._2).sum
    val sxx = ts2.map(p => p._1 * p._1).sum
    val ols2 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val olsMoved = math.abs(ols2 - olsSlope)
    assert(tsMoved < olsMoved / 3,
      s"median-of-slopes must resist the outlier: TS moved $tsMoved, " +
        s"OLS moved $olsMoved")
    assert(intercept.isFinite)
  }
}
