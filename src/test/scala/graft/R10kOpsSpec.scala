package graft

import graft.queries.{EventOps, StatsOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10k diagnostics: Benford's pinned failure on
  * narrow-range synthetic prices, Hill's estimator against a sorted
  * reference, the Markov model's probability laws, and the ACF's
  * bounds with a brute-force lag-1 replay. */
class R10kOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_benford ---------------------------------------------------------

  test("benford: digits partition the orders, expectations sum to 1, " +
      "and the synthetic price range fails the audit (pinned)") {
    val rows = StatsOps.qBenford(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1 to 9).toSet))
    assert(rows.map(_._2).sum == Tables.df(spark, sf, "orders").count())
    val expSum = (1 to 9).map(d => math.log(1.0 + 1.0 / d)
      / math.log(10.0)).sum
    assert(math.abs(expSum - 1.0) < 1e-9)
    rows.foreach { case (d, _, share, benford, chi2) =>
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(benford - math.rint(1e6 * math.log(1.0 + 1.0 / d)
        / math.log(10.0)) / 1e6) < 1e-9)
      assert(chi2 >= 0.0)
    }
    // TPC-H totalprice is narrow-range uniform, NOT Benford: the audit
    // must fire decisively (chi2 >> critical value ~20 at 8 dof)
    val chi2 = rows.map(_._5).sum
    assert(chi2 > 100.0,
      s"synthetic prices must fail Benford loudly, chi2 $chi2 — if this " +
        "fires the fixture's price generator changed shape")
  }

  // ---- q_hill_tail -------------------------------------------------------

  test("hill tail: matches a sorted-array reference and reads the " +
      "fixture's light tail as a large alpha") {
    val r = StatsOps.qHillTail(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    val (kUsed, xk, meanLn, alpha) = r
    val spend = Tables.df(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("s"))
      .select($"s").as[Double].collect().sortBy(-_)
    val top = spend.take(101)
    val boundary = top.min
    val terms = top.filter(_ > boundary).map(x => math.log(x / boundary))
    assert(kUsed == terms.length)
    assert(math.abs(xk - boundary) < 0.01)
    assert(math.abs(meanLn - terms.sum / terms.length) < 1e-4)
    assert(math.abs(alpha - terms.length / terms.sum) < 1e-2)
    assert(alpha > 2.0,
      s"a bounded synthetic spend distribution has a light tail: $alpha")
  }

  // ---- q_markov_chain ----------------------------------------------------

  test("markov chain: rows per source sum to probability 1, entropy " +
      "bounded by ln(out-degree), transitions conserve bigrams") {
    val rows = EventOps.qMarkovChain(spark, sf)
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val nBigrams = Tables.df(spark, sf, "events").count() -
      Tables.df(spark, sf, "events").select($"user_id").distinct().count()
    assert(rows.map(_._3).sum == nBigrams,
      "every adjacent pair contributes exactly one transition")
    rows.groupBy(_._1).foreach { case (cur, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4,
        s"P(.|$cur) must sum to 1")
      val h = rs.head._5
      assert(rs.forall(_._5 == h))
      assert(h >= -1e-9 && h <= math.log(rs.size.toDouble) + 1e-6,
        s"0 <= H <= ln(out-degree): $h vs ln(${rs.size})")
    }
  }

  // ---- q_autocorr --------------------------------------------------------

  test("autocorr: |acf| <= 1 with a brute-force lag-1 replay") {
    val rows = EventOps.qAutocorr(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSet.subsetOf((1 to 7).toSet))
    rows.foreach { case (_, nPairs, acf) =>
      assert(nPairs > 0)
      assert(acf >= -1.0 - 1e-6 && acf <= 1.0 + 1e-6)
    }
    val daily = Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("x"))
      .select($"d".cast("string"), $"x").as[(String, Double)]
      .collect().sortBy(_._1)
    val xs = daily.map(_._2)
    val m = xs.sum / xs.length
    val den = xs.map(x => (x - m) * (x - m)).sum
    // day spine is contiguous in the fixture, so index shift == day lag
    val gaps = daily.map(_._1).sliding(2).forall { p =>
      java.time.LocalDate.parse(p(1)).toEpochDay -
        java.time.LocalDate.parse(p(0)).toEpochDay == 1
    }
    assume(gaps, "non-contiguous day spine; skip the index-shift replay")
    val want = xs.drop(1).zip(xs.dropRight(1))
      .map { case (a, b) => (a - m) * (b - m) }.sum / den
    val got = rows.find(_._1 == 1).get._3
    assert(math.abs(got - want) < 1e-4, s"lag-1 acf $got vs $want")
  }
}
