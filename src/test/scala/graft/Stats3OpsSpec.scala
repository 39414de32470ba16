package graft

import graft.queries.{SeriesOps, Stats3Ops}
import graft.Tables
import org.apache.spark.sql.functions._

/** Sequential replays of the Stats3Ops closed forms (VERDICT r16 #2):
  * each op's decimal/rounding chain re-executed row-by-row on the
  * collected sf0.001 relation and compared bit-for-bit against the
  * distributed result — the same replay discipline as R13bOpsSpec. */
class Stats3OpsSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dec(x: Double, k: Int): BigDecimal =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP)

  /** The shared daily series as (t ascending) 2dp decimals. */
  private lazy val ys: Vector[BigDecimal] = {
    import spark.implicits._
    SeriesOps.dailySeries(spark, sf).orderBy($"t")
      .select($"y").collect()
      .map(r => BigDecimal(r.getDecimal(0))).toVector
  }

  test("q_adf_lite replays the sequential DF regression bit-for-bit") {
    val n = ys.size
    val pairs = (1 until n).map(i => (ys(i - 1), ys(i) - ys(i - 1)))
    val m = pairs.size
    val sx = pairs.map(_._1).sum
    val sz = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val sxz = pairs.map(p => p._1 * p._2).sum
    val szz = pairs.map(p => p._2 * p._2).sum
    val dxx = sxx.toDouble - sx.toDouble * sx.toDouble / m
    val beta = (sxz.toDouble - sx.toDouble * sz.toDouble / m) / dxx
    val alpha = (sz.toDouble - beta * sx.toDouble) / m
    val sse = math.max(
      szz.toDouble - alpha * sz.toDouble - beta * sxz.toDouble, 0.0)
    val se = math.sqrt(sse / (m - 2) / dxx)
    val row = Stats3Ops.qAdfLite(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_pairs") === m.toLong)
    assert(row.getAs[Double]("alpha") === rnd(alpha, 6))
    assert(row.getAs[Double]("beta") === rnd(beta, 6))
    assert(row.getAs[Double]("t_df") === rnd(beta / se, 6))
    assert(row.getAs[Boolean]("stationary") === (rnd(beta / se, 6) < -2.86))
  }

  test("q_variance_ratio replays VR(2)/VR(4) bit-for-bit; VR(1) would " +
      "be identically 1 by construction") {
    val n = ys.size
    val inc = (1 until n).map(i => ys(i) - ys(i - 1))
    val m = inc.size
    val sd = inc.sum
    val ss1 = inc.map(d =>
      dec((d.toDouble - sd.toDouble / m) * (d.toDouble - sd.toDouble / m),
        9)).sum
    val rows = Stats3Ops.qVarianceRatio(spark, sf).collect()
      .map(r => r.getAs[Int]("q") -> r).toMap
    for (q <- Seq(2, 4)) {
      val dq = (q until n).map(i => ys(i) - ys(i - q))
      val mq = dq.size
      val ssq = dq.map(d =>
        dec((d.toDouble - q * sd.toDouble / m)
          * (d.toDouble - q * sd.toDouble / m), 9)).sum
      val vr = (ssq.toDouble / (q * mq)) / (ss1.toDouble / m)
      val z = (vr - 1) / math.sqrt(
        2.0 * (2.0 * q - 1) * (q - 1) / (3.0 * q * m))
      val row = rows(q)
      assert(row.getAs[Long]("n_incs") === m.toLong)
      assert(row.getAs[Double]("vr") === rnd(vr, 6))
      assert(row.getAs[Double]("z") === rnd(z, 6))
      assert(row.getAs[Boolean]("rw_ok") === (math.abs(rnd(z, 6)) < 1.96))
    }
  }

  test("q_bartlett replays the pooled-ln chain bit-for-bit and reads " +
      "the fixture's equal-variance direction") {
    import spark.implicits._
    val raw = Tables.df(spark, sf, "orders")
      .select($"o_orderpriority",
        round($"o_totalprice", 2).cast("decimal(18,2)").as("x"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
    val groups = raw.groupBy(_._1).map { case (_, rs) =>
      val xs = rs.map(_._2)
      val nn = xs.size
      val sx = xs.sum
      val sx2 = xs.map(x => dec(x.toDouble * x.toDouble, 4)).sum
      val ss = dec(sx2.toDouble - sx.toDouble * sx.toDouble / nn, 9)
      (nn, nn - 1, ss)
    }.filter(g => g._1 > 1 && g._3 > 0).toSeq
    val k = groups.size
    val nn = groups.map(_._1).sum
    val dfs = groups.map(_._2).sum
    val sss = groups.map(_._3).sum
    val lts = groups.map(g =>
      dec(g._2 * math.log(g._3.toDouble / g._2), 9)).sum
    val rds = groups.map(g => dec(1.0 / g._2, 9)).sum
    val sp2 = sss.toDouble / dfs
    val num = dfs * math.log(sp2) - lts.toDouble
    val cc = 1.0 + (rds.toDouble - 1.0 / dfs) / (3.0 * (k - 1))
    val row = Stats3Ops.qBartlett(spark, sf).collect()(0)
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("n") === nn.toLong)
    assert(row.getAs[Double]("s2_pooled") === rnd(sp2, 2))
    assert(row.getAs[Double]("bartlett_t") === rnd(num / cc, 6))
    assert(row.getAs[Boolean]("equal_var")
      === (rnd(num / cc, 6) <= row.getAs[Double]("chi2_crit")))
    // fixture direction: order totals are priority-independent by
    // construction, so the equal-variance null must NOT reject here
    assert(row.getAs[Boolean]("equal_var"),
      "the synthetic fixture has priority-independent order values — a " +
        "rejection means the test statistic chain broke")
  }

  test("q_mood_median replays the dichotomize-and-χ² chain bit-for-bit") {
    val nd = ys.size
    // house middle-two median on the (y, t) order
    val ranked = ys.zipWithIndex.map { case (y, i) => (y, i + 1) }
      .sortBy(identity)
    val lo = ranked((nd + 1) / 2 - 1)._1
    val hi = ranked((nd + 2) / 2 - 1)._1
    val med = (lo + hi).toDouble / 2
    val cells = ys.zipWithIndex.map { case (y, i) =>
      (i + 1 <= nd / 2, y.toDouble > med)
    }
    val a = cells.count(c => c._1 && c._2).toLong
    val b = cells.count(c => !c._1 && c._2).toLong
    val c = cells.count(c => c._1 && !c._2).toLong
    val d = cells.count(c => !c._1 && !c._2).toLong
    val n = a + b + c + d
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    val chi2 = rnd(n * math.pow(math.max(
        math.abs((a * d - b * c).toDouble) - n.toDouble / 2, 0.0), 2)
      / denom.toDouble, 6)
    val row = Stats3Ops.qMoodMedian(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_early") === a + c)
    assert(row.getAs[Long]("n_late") === b + d)
    assert(row.getAs[Long]("above_early") === a)
    assert(row.getAs[Long]("above_late") === b)
    assert(row.getAs[Double]("median") === rnd(med, 6))
    assert(row.getAs[Double]("chi2") === chi2)
    assert(row.getAs[Boolean]("diff_sig") === (chi2 > 3.841))
  }

  test("q_cooks_distance replays every day's leverage and D bit-for-bit; " +
      "flags are definition-consistent") {
    val n = ys.size
    val st = (1 to n).map(_.toLong).sum
    val stt = (1 to n).map(t => t.toLong * t).sum
    val sy = ys.sum
    val sty = ys.zipWithIndex.map { case (y, i) => y * (i + 1) }.sum
    val sxx = stt.toDouble - st.toDouble * st.toDouble / n
    val b = (sty.toDouble - st.toDouble * sy.toDouble / n) / sxx
    val a = (sy.toDouble - b * st) / n
    val es = ys.zipWithIndex.map { case (y, i) =>
      y.toDouble - a - b * (i + 1) }
    val sse = es.map(e => dec(e * e, 9)).sum
    val s2 = sse.toDouble / (n - 2)
    val rows = Stats3Ops.qCooksDistance(spark, sf).collect()
    assert(rows.length === n)
    rows.foreach { r =>
      val t = r.getAs[Int]("t")
      val e = es(t - 1)
      val h = 1.0 / n + (t - st.toDouble / n) * (t - st.toDouble / n) / sxx
      val dD = rnd(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
      assert(r.getAs[Double]("resid") === rnd(e, 6))
      assert(r.getAs[Double]("leverage") === rnd(h, 6))
      assert(r.getAs[Double]("cooks_d") === dD)
      assert(r.getAs[Boolean]("influential") === (dD > 4.0 / n))
    }
    // influence needs residual: every flagged day sits above the mean
    // absolute residual (leverage alone cannot push D over 4/n here)
    val meanAbsE = es.map(math.abs).sum / n
    rows.filter(_.getAs[Boolean]("influential")).foreach { r =>
      assert(math.abs(r.getAs[Double]("resid")) > meanAbsE,
        s"day ${r.getAs[Int]("t")} flagged influential with a " +
          "below-average residual")
    }
  }
}
