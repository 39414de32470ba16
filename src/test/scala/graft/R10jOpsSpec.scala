package graft

import graft.queries.{Analytics, EventOps, StatsOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10j statistical operators: KS replayed
  * against a brute-force CDF walk, Gini against a sorted-array
  * reference, and propensity stratification's null-effect pin on the
  * synthetic parity treatment. */
class R10jOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_ks_drift --------------------------------------------------------

  test("ks drift: D matches a brute-force two-sample CDF walk and the " +
      "halves partition the stream") {
    val r = StatsOps.qKsDrift(spark, sf)
      .as[(Long, Long, Double, Double, Double, Boolean)].head()
    val (n1, n2, d, lambda, p, drift) = r
    assert(n1 + n2 == Tables.df(spark, sf, "events").count())
    assert(d >= 0.0 && d <= 1.0 && p >= 0.0 && p <= 1.0)
    assert(drift == (p < 0.05))
    val ev = Tables.df(spark, sf, "events")
      .select(unix_micros($"ts".cast("timestamp")).as[Long],
        $"value".as[Double]).collect()
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val s1 = ev.filter(_._1 < mid).map(_._2).sorted
    val s2 = ev.filter(_._1 >= mid).map(_._2).sorted
    assert(s1.length == n1 && s2.length == n2)
    val pooled = (s1 ++ s2).distinct.sorted
    val want = pooled.map { v =>
      math.abs(s1.count(_ <= v).toDouble / s1.length
        - s2.count(_ <= v).toDouble / s2.length)
    }.max
    assert(math.abs(d - want) < 1e-5, s"D $d vs brute force $want")
    assert(math.abs(lambda - want * math.sqrt(
      n1.toDouble * n2 / (n1 + n2))) < 1e-4)
  }

  // ---- q_gini ------------------------------------------------------------

  test("gini: matches the sorted-array formula and sits in [0,1)") {
    val r = Analytics.qGini(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    val (n, total, mean, gini) = r
    val spend = Tables.df(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
        .as("s"))
      .select($"s").as[Double].collect().sorted
    assert(n == spend.length)
    assert(math.abs(total - spend.sum) < 0.5)
    assert(math.abs(mean - spend.sum / n) < 1e-3)
    // classic rank formula on the sorted array
    val want = (2.0 * spend.zipWithIndex.map { case (x, i) =>
      (i + 1) * x
    }.sum) / (n * spend.sum) - (n + 1.0) / n
    assert(gini >= 0.0 && gini < 1.0)
    assert(math.abs(gini - want) < 1e-4,
      s"gini $gini vs rank-formula $want")
  }

  // ---- q_propensity ------------------------------------------------------

  test("propensity: strata partition users, weights sum to 1, and the " +
      "parity pseudo-treatment shows no large effect (pinned)") {
    val rows = EventOps.qPropensity(spark, sf)
      .as[(Int, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Double)].collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.df(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers)
    rows.foreach { case (s, n, nt, nc, _, _, _, _) =>
      assert(s >= 1 && s <= 5)
      assert(nt + nc == n)
    }
    assert(math.abs(rows.map(_._8).sum - 1.0) < 1e-4)
    // user-id parity cannot move conversion: every defined within-
    // stratum contrast should be modest (sampling noise only)
    val ate = rows.flatMap(r => r._7.map(_ * r._8)).sum
    assert(math.abs(ate) < 0.25,
      s"null pseudo-treatment must show ~no effect, weighted ATE $ate")
  }
}
