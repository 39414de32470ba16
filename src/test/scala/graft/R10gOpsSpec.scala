package graft

import graft.queries.{CorpusOps, EventOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Properties of the round-10g diagnostics: burstiness's moment
  * identities and the pinned near-Poisson fixture reading, seasonality's
  * lift identity, and the discounted-returns pipeline replayed against a
  * brute-force trajectory walk. */
class R10gOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_burstiness ------------------------------------------------------

  test("burstiness: moment identities hold and the synthetic corpus " +
      "reads near-Poisson (pinned)") {
    val rows = CorpusOps.qBurstiness(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length == 20)
    val nAll = Tables.df(spark, sf, "documents").count()
    rows.foreach { case (_, nDocs, total, mean, vmr) =>
      assert(nDocs <= total && nDocs <= nAll)
      assert(math.abs(mean - total.toDouble / nAll) < 1e-5)
      assert(vmr > 0.0)
    }
    assert(rows.forall(r => r._5 > 0.8 && r._5 < 3.0),
      s"synthetic near-uniform text must read near-Poisson, far from " +
        s"natural content-word burstiness (VMR 10+): ${rows.map(_._5).toSeq}")
    // brute-force one term's VMR over all docs (zeros included)
    val (tok, _, _, _, wantVmr) = rows.head
    val counts = Tables.df(spark, sf, "documents")
      .select(size(filter(TextFunctions.tokens($"text"), t => t === tok))
        .as("c")).as[Int].collect().map(_.toDouble)
    val m = counts.sum / counts.length
    val v = counts.map(c => c * c).sum / counts.length - m * m
    assert(math.abs(wantVmr - v / m) < 1e-4,
      s"$tok: reported VMR $wantVmr vs brute-force ${v / m}")
  }

  // ---- q_seasonality -----------------------------------------------------

  test("seasonality: cell counts conserve events and the lift identity " +
      "holds per cell") {
    val rows = EventOps.qSeasonality(spark, sf)
      .as[(String, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    val total = Tables.df(spark, sf, "events").count()
    assert(rows.map(_._3).sum == total)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 23))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val byHr = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { case (t, h, n, idx) =>
      val want = n.toDouble * total / (byType(t) * byHr(h))
      assert(math.abs(idx - want) < 1e-5, s"($t,$h): $idx vs $want")
    }
  }

  // ---- q_returns ---------------------------------------------------------

  test("returns: per-type baselines match a brute-force discounted " +
      "trajectory walk, and advantage bounds are consistent") {
    val rows = EventOps.qReturns(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    assert(rows.map(_._2).sum == Tables.df(spark, sf, "events").count())
    rows.foreach { case (t, _, baseline, minAdv, maxAdv, meanAbs) =>
      assert(baseline > 0.0, s"$t: future purchases give positive returns")
      assert(minAdv >= -baseline - 1e-4,
        s"$t: returns are non-negative so adv >= -baseline")
      assert(maxAdv >= 0.0 && meanAbs >= 0.0 && meanAbs <= maxAdv)
    }
    // brute-force replay: per user-day episodes, gamma=0.9 discounted
    val ev = Tables.df(spark, sf, "events")
      .select($"user_id", to_date($"ts").cast("string").as("d"),
        unix_micros($"ts".cast("timestamp")).as("tsl"), $"event_id",
        $"event_type",
        when($"event_type" === "purchase", $"value").otherwise(0.0)
          .as("r"))
      .as[(Long, String, Long, Long, String, Double)].collect()
    val returns = ev.groupBy(e => (e._1, e._2)).values.flatMap { ep =>
      val sorted = ep.sortBy(e => (e._3, e._4))
      sorted.indices.map { t =>
        val g = sorted.drop(t).zipWithIndex
          .map { case (e, k) => math.pow(0.9, k) * e._6 }.sum
        (sorted(t)._5, g)
      }
    }.toSeq
    val want = returns.groupBy(_._1).view
      .mapValues(gs => gs.map(_._2).sum / gs.size).toMap
    rows.foreach { case (t, _, baseline, _, _, _) =>
      assert(math.abs(baseline - want(t)) < 1e-3,
        s"$t: baseline $baseline vs brute-force ${want(t)}")
    }
  }
}
