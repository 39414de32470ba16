package graft

import graft.queries.StatsOps
import org.apache.spark.sql.functions._

/** Properties of the round-10u time-series operators: heavy-change's
  * share accounting and ranking, and the decomposition's reassembly
  * identity (trend + seasonal + residual = x exactly, by
  * construction) with a centered seasonal component. */
class R10uOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_heavy_change ----------------------------------------------------

  test("heavy change: share identities hold and ranking is by absolute " +
      "delta") {
    val rows = StatsOps.qHeavyChange(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (_, c1, c2, s1, s2, delta) =>
      assert(c1 + c2 > 0)
      assert(math.abs(delta - BigDecimal(s2 - s1).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
    val d = rows.map(r => math.abs(r._6))
    assert(d.sliding(2).forall(p => p.head >= p.last - 1e-9),
      "ordered by |delta| descending")
  }

  // ---- q_stl_lite --------------------------------------------------------

  test("stl lite: components reassemble x exactly, seasonal is " +
      "dow-constant and centered, trend is locally smooth") {
    val rows = StatsOps.qStlLite(spark, sf)
      .as[(String, Int, Double, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, dow, x, trend, seasonal, resid) =>
      assert(dow >= 0 && dow <= 6)
      assert(math.abs(x - (trend + seasonal + resid)) < 1e-5,
        "additive decomposition must reassemble the series")
    }
    // seasonal depends only on dow
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._5).distinct.length == 1)
    }
    // centered: the 7 seasonal values sum to ~0
    val seas = rows.map(r => (r._2, r._5)).distinct.map(_._2)
    assert(math.abs(seas.sum) < 1e-3,
      s"centered seasonal must sum to ~0: ${seas.sum}")
    // interior trend points average a full 7-day window: recompute one
    val xs = rows.map(_._3)
    if (xs.length >= 7) {
      val i = xs.length / 2
      val want = xs.slice(i - 3, i + 4).sum / 7
      assert(math.abs(rows(i)._4 - want) < 1e-4,
        s"trend at interior day: ${rows(i)._4} vs $want")
    }
  }
}
