package graft

import graft.queries.{Analytics, EventOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10c behavioral-analytics operators that the
  * DuckDB hash gate can't see: RFM's quintile grid conserves customers
  * and orders each metric correctly, association rules obey the
  * support/confidence/lift identities, and the Kaplan–Meier curve is a
  * valid survival function (monotone non-increasing from ≤1, risk sets
  * telescoping by the users removed at each step). */
class R10cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_rfm -------------------------------------------------------------

  test("rfm: quintiles in 1..5, customer count conserved, monetary " +
      "quintile ordered by its cell means") {
    val rows = Analytics.qRfm(spark, sf)
      .select($"r_q", $"f_q", $"m_q", $"n_cust", $"avg_m")
      .as[(Int, Int, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Seq(r._1, r._2, r._3).forall(q => q >= 1 && q <= 5)))
    val nCust = Tables.df(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust,
      "every customer lands in exactly one RFM cell")
    // higher monetary quintile ⇒ strictly higher mean monetary value
    // (aggregate over cells weighted by n_cust)
    val byM = rows.groupBy(_._3).map { case (m, rs) =>
      m -> rs.map(r => r._5 * r._4).sum / rs.map(_._4).sum
    }.toSeq.sortBy(_._1)
    assert(byM.map(_._2).sliding(2).forall(p => p.head < p.last),
      s"monetary quintile means must increase: $byM")
  }

  test("rfm plan: bin assignment is a broadcast of the 1-row cuts, " +
      "no global-sort ntile") {
    val plan = Analytics.qRfm(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "quintile cuts must broadcast, not shuffle")
    // \b guard: "percentile(" would match a bare contains("ntile")
    assert(!"""\bntile\(""".r.findFirstIn(plan).isDefined,
      "no global ntile window")
  }

  // ---- q_assoc_rules -----------------------------------------------------

  test("assoc rules: directional identities hold — support*N = n_pair, " +
      "confidence = n_pair/n_ante, lift = confidence/(n_cons/N)") {
    val items = Tables.df(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val nOrders = items.select($"l_orderkey").distinct().count()
    val rows = Analytics.qAssocRules(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (ante, cons, nPair, nAnte, nCons, sup, conf, lift) =>
      assert(ante != cons)
      assert(nPair >= 3 && nAnte >= nPair && nCons >= nPair)
      assert(math.abs(sup - nPair.toDouble / nOrders) < 1e-6)
      assert(math.abs(conf - nPair.toDouble / nAnte) < 1e-6)
      assert(math.abs(lift - nPair.toDouble * nOrders / (nAnte * nCons))
        < 1e-5)
    }
    // top-20 is ordered by lift descending with (ante, cons) tie-break
    val keys = rows.map(r => (-r._8, r._1, r._2)).toSeq
    assert(keys == keys.sorted, "result must be lift-desc ordered")
  }

  // ---- q_survival --------------------------------------------------------

  test("survival: valid product-limit curve — monotone non-increasing, " +
      "risk sets telescope, user counts conserved") {
    val rows = EventOps.qSurvival(spark, sf)
      .select($"t", $"n_risk", $"d_churned", $"c_censored", $"survival")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val nUsers = Tables.df(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.head._2 == nUsers, "first risk set = all users")
    // risk set at step k+1 = risk set at k minus everyone who exited at k
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 == a._2 - a._3 - a._4)
      case _           =>
    }
    assert(rows.map(r => r._3 + r._4).sum == nUsers,
      "every user exits exactly once (churn or censor)")
    val s = rows.map(_._5)
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s.sliding(2).forall(p => p.head >= p.last - 1e-9),
      s"survival must be non-increasing: ${s.toSeq}")
    // manual product-limit recomputation agrees to rounding tolerance
    var prod = 1.0
    rows.foreach { r =>
      prod *= (1.0 - r._3.toDouble / r._2)
      assert(math.abs(r._5 - prod) < 1e-5,
        s"KM product mismatch at t=${r._1}: ${r._5} vs $prod")
    }
  }
}
