package graft

import graft.queries.{Aggregates, Windows}
import org.apache.spark.sql.functions._

class AggregateWindowSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact; approx median within range") {
    import spark.implicits._
    val approx = Aggregates.qApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.df(spark, sf, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("percentiles are ordered p25 <= p50 <= p75 <= p95") {
    val rows = Aggregates.qPercentile(spark, sf).collect()
    rows.foreach { r =>
      val Seq(p25, p50, p75, p95) = (1 to 4).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  test("rollup row count = detail + per-status subtotals + grand total") {
    import spark.implicits._
    val o = Tables.df(spark, sf, "orders")
    val detail = o.select($"o_orderstatus", $"o_orderpriority").distinct().count()
    val statuses = o.select($"o_orderstatus").distinct().count()
    assert(Aggregates.qRollup(spark, sf).count() === detail + statuses + 1)
  }

  test("variance matches the exact-moment formula") {
    import spark.implicits._
    val got = Aggregates.qAggStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("vp")).toMap
    val manual = Tables.df(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg((sum($"l_quantity" * $"l_quantity") / count(lit(1))
        - pow(sum($"l_quantity") / count(lit(1)), 2)).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, v) <- manual)
      assert(math.abs(got(k) - v) < 1e-3, s"$k: ${got(k)} vs $v")
  }

  test("row_number is a permutation of 1..n within each partition") {
    val rows = Windows.qWinRank(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted
      assert(rns === (1 to rs.length).toArray)
    }
  }

  test("running sum is non-decreasing per supplier") {
    val rows = Windows.qWinFrame(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("l_suppkey")).foreach { case (_, rs) =>
      val runs = rs.map(_.getAs[Double]("running_qty"))
      assert(runs.zip(runs.tail).forall { case (a, b) => b >= a })
    }
  }

  test("lead/lag are inverse shifts") {
    val rows = Windows.qWinAnalytic(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs0) =>
      // reorder to the window's (o_orderdate, o_orderkey) ordering — the
      // query's final output sort is by (custkey, orderkey) instead
      val rs = rs0.sortBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getAs[Long]("o_orderkey")))
      val prices = rs.map(_.getAs[Double]("o_totalprice"))
      val leads = rs.map(r => Option(r.getAs[java.lang.Double]("next_price")))
      val lags = rs.map(r => Option(r.getAs[java.lang.Double]("prev_price")))
      for (i <- rs.indices) {
        if (i + 1 < rs.length) assert(leads(i).contains(prices(i + 1)))
        else assert(leads(i).isEmpty)
        if (i > 0) assert(lags(i).contains(prices(i - 1)))
        else assert(lags(i).isEmpty)
      }
    }
  }
}
