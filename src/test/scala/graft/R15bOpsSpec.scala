package graft

import graft.queries.{GovernOps, Series2Ops, SqlSurface2, Stats2Ops}
import org.apache.spark.sql.functions._

/** Round-15 second batch: multiple-testing family completion, SPC,
  * Hodges–Lehmann, the Theta forecaster, and the try_* surface — each
  * replayed driver-side or pinned by the property its semantics
  * guarantee. */
class R15bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("by fdr: adjusted p dominates BH row-for-row, rejects are a " +
      "subset, and c(m) replays as the harmonic number") {
    val by = GovernOps.qByFdr(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(5), r.getBoolean(6))).toMap
    val bh = GovernOps.qBhFdr(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getBoolean(5))).toMap
    assert(by.keySet == bh.keySet)
    by.foreach { case (k, (adjBy, rejBy)) =>
      val (adjBh, rejBh) = bh(k)
      assert(adjBy >= adjBh - 1e-9,
        s"BY must be at least as conservative as BH at $k")
      assert(!rejBy || rejBh, s"BY rejects must be a subset of BH at $k")
    }
    val m = by.size
    val cm = math.rint((1 to m).map(i =>
      math.rint(1e12 / i) / 1e12).sum * 1e6) / 1e6
    val gotCm = GovernOps.qByFdr(spark, sf).head().getDouble(4)
    assert(math.abs(gotCm - cm) < 1e-9, s"c($m) $gotCm vs replay $cm")
  }

  test("spc xbar: limits replay from the pooled within-day variance and " +
      "ooc flags are exactly the outside-limits days") {
    val rows = Stats2Ops.qSpcXbar(spark, sf).collect()
    val centers = rows.map(_.getDouble(3)).distinct
    assert(centers.length == 1, "the center line is one grand mean")
    // driver replay from the raw orders
    val xs = Tables.df(spark, sf, "orders")
      .select($"o_orderdate".cast("string").as("d"),
        round($"o_totalprice", 2).cast("double").as("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val byDay = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tn = xs.length
    val xbb = xs.map(_._2).sum / tn
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    val (dfs, sss) = byDay.values.filter(_.length > 1)
      .map { vs =>
        val (n, s, s2) = (vs.length, vs.sum,
          vs.map(v => math.rint(v * v * 1e4) / 1e4).sum)
        (n - 1, r9(s2 - s * s / n))
      }.foldLeft((0L, 0.0)) { case ((a, b), (c, d)) => (a + c, b + d) }
    val sp = math.sqrt(sss / dfs)
    rows.foreach { r =>
      val (d, n) = (r.getString(0), r.getLong(1))
      val hw = 3.0 * sp / math.sqrt(n.toDouble)
      assert(math.abs(r.getDouble(3) - math.rint(xbb * 1e6) / 1e6) < 1e-5)
      assert(math.abs(r.getDouble(4) - math.rint((xbb - hw) * 1e6) / 1e6)
        < 1e-5, s"lcl mismatch on $d")
      assert(math.abs(r.getDouble(5) - math.rint((xbb + hw) * 1e6) / 1e6)
        < 1e-5, s"ucl mismatch on $d")
      val xbar = byDay(d).sum / byDay(d).length
      assert(r.getBoolean(6) == (xbar < xbb - hw || xbar > xbb + hw),
        s"ooc flag must match the limit test on $d")
    }
  }

  test("hl shift: the estimate is the median of all cross-half pairwise " +
      "differences and resists a synthetic outlier better than the mean") {
    val r = Stats2Ops.qHlShift(spark, sf).head()
    val ys = graft.queries.SeriesOps.dailySeries(spark, sf)
      .orderBy($"t").select($"y".cast("double")).collect()
      .map(_.getDouble(0))
    val nd = ys.length
    val (early, late) = ys.splitAt(nd / 2)
    val diffs = (for (a <- early; b <- late) yield b - a).sorted
    val np = diffs.length
    assert(r.getLong(0) == np.toLong)
    val med = (diffs((np + 1) / 2 - 1) + diffs((np + 2) / 2 - 1)) / 2
    assert(math.abs(r.getDouble(1) - math.rint(med * 1e6) / 1e6) < 1e-9,
      s"hl ${r.getDouble(1)} vs replay $med")
    val mean = diffs.sum / np
    assert(math.abs(r.getDouble(2) - math.rint(mean * 1e6) / 1e6) < 1e-6)
    // robustness: perturbing ONE late day by +1e6 moves the mean by
    // ~1e6*|early|/np but the HL median by far less
    val spiked = (for (a <- early; b <- late.updated(0, late(0) + 1e6))
      yield b - a).sorted
    val medS = (spiked((np + 1) / 2 - 1) + spiked((np + 2) / 2 - 1)) / 2
    val meanS = spiked.sum / np
    assert(math.abs(medS - med) < math.abs(meanS - mean) / 100,
      "the HL estimate must be robust where the mean is not")
  }

  test("theta forecast: trend is the exact OLS line, the SES level " +
      "replays from the weight unroll, and theta is their average") {
    val rows = Series2Ops.qThetaForecast(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 7)
    val ys = graft.queries.SeriesOps.dailySeries(spark, sf)
      .orderBy($"t").select($"y".cast("double")).collect()
      .map(_.getDouble(0))
    val n = ys.length
    val ts = (1 to n).map(_.toDouble)
    val (st, stt) = (ts.sum, ts.map(t => t * t).sum)
    val (sy, syt) = (ys.sum, ys.zip(ts).map { case (y, t) => y * t }.sum)
    val b = (n * syt - st * sy) / (n * stt - st * st)
    val a = (sy - b * st) / n
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    val lvl = ys.zipWithIndex.map { case (y, i) =>
      val t = i + 1
      val w = if (t == 1) math.pow(0.5, n - 1)
        else 0.5 * math.pow(0.5, n - t)
      r9(w * (2.0 * y - (a + b * t)))
    }.sum
    rows.foreach { r =>
      val h = r.getInt(0)
      val trend = math.rint((a + b * (n + h)) * 1e6) / 1e6
      assert(math.abs(r.getDouble(1) - trend) < 1e-5,
        s"trend@$h ${r.getDouble(1)} vs replay $trend")
      assert(math.abs(r.getDouble(2) - math.rint(lvl * 1e6) / 1e6) < 1e-5)
      assert(math.abs(r.getDouble(3)
        - math.rint(0.5 * ((a + b * (n + h)) + lvl) * 1e6) / 1e6) < 1e-5,
        "theta must be the half-and-half combination")
    }
    // the trend component must be exactly linear in h
    val tr = rows.map(_.getDouble(1))
    val gaps = tr.zip(tr.tail).map { case (x, y) => y - x }
    assert(gaps.forall(g => math.abs(g - gaps.head) < 1e-5))
  }

  test("try arith: every row's expected value replays from the ANSI " +
      "semantics (NULL on overflow / div-zero / bad cast / oob index)") {
    val rows = SqlSurface2.qTryArith(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val k = r.getLong(0)
      if (k % 5 == 0) assert(r.isNullAt(1))
      else assert(math.abs(r.getDouble(1) - k.toDouble / (k % 5)) < 1e-12)
      if (k % 2 == 0) assert(r.getLong(2) == Long.MaxValue)
      else assert(r.isNullAt(2), s"try_add must NULL on overflow at $k")
      (k % 4) match {
        case 0 => assert(r.getLong(3) == 0L)
        case 1 => assert(r.getLong(3) == 4611686018427387904L)
        case _ => assert(r.isNullAt(3),
          s"try_multiply must NULL on overflow at $k")
      }
      if (k % 3 == 0) assert(r.getInt(4) == 123)
      else assert(r.isNullAt(4), "try_cast must NULL on a bad numeric")
      val idx = (k % 5 + 1).toInt
      if (idx <= 3) assert(r.getInt(5) == idx * 10)
      else assert(r.isNullAt(5), "try_element_at must NULL out of bounds")
    }
  }
}
