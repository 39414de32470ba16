package graft

import graft.queries.Series2Ops
import org.apache.spark.sql.functions._

/** Round-14 series-diagnostics pack: each statistic replayed against a
  * plain driver-side computation over the same collected day series —
  * the brute-force-replay discipline of the earlier R*OpsSpec suites. */
class R14OpsSpec extends SparkSpec {

  import spark.implicits._

  /** The daily purchase series as the tests' ground truth. */
  private lazy val series: Array[Double] =
    Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(round($"value", 2)
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("y"))
      .orderBy($"d")
      .select($"y".cast("double"))
      .collect().map(_.getDouble(0))

  test("ljung-box: per-lag Q replays the textbook formula and grows " +
      "monotonically with lag") {
    val rows = Series2Ops.qLjungBox(spark, sf).collect()
    assert(rows.length == 7)
    val n = series.length
    val mean = series.sum / n
    val dev = series.map(_ - mean)
    val den = dev.map(e => math.rint(e * e * 1e9) / 1e9).sum
    var cum = 0.0
    rows.sortBy(_.getInt(0)).foreach { r =>
      val lag = r.getInt(0)
      val num = (lag until n)
        .map(i => math.rint(dev(i) * dev(i - lag) * 1e9) / 1e9).sum
      val rk = math.rint(num / den * 1e6) / 1e6
      assert(math.abs(r.getDouble(1) - rk) < 1e-9,
        s"lag $lag acf ${r.getDouble(1)} vs replay $rk")
      cum += math.rint(rk * rk / (n - lag) * 1e9) / 1e9
      val q = math.rint(n * (n + 2) * cum * 1e6) / 1e6
      assert(math.abs(r.getDouble(2) - q) < 1e-6,
        s"lag $lag Q ${r.getDouble(2)} vs replay $q")
      assert(r.getLong(3) == lag.toLong)
    }
    val qs = rows.sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a },
      "cumulative Q must be non-decreasing in lag")
  }

  test("jarque-bera: moments replay and JB recombines from the emitted " +
      "skewness/kurtosis") {
    val r = Series2Ops.qJarqueBera(spark, sf).head()
    val n = series.length
    assert(r.getLong(0) == n.toLong)
    val mean = series.sum / n
    val dev = series.map(_ - mean)
    def m(p: Int): Double =
      dev.map(e => math.rint(math.pow(e, p) * 1e9) / 1e9).sum / n
    val g1 = m(3) / (m(2) * math.sqrt(m(2)))
    val g2 = m(4) / (m(2) * m(2)) - 3.0
    assert(math.abs(r.getDouble(1) - g1) < 1e-5, "skewness replay")
    assert(math.abs(r.getDouble(2) - g2) < 1e-5, "kurtosis replay")
    val jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert(math.abs(r.getDouble(3) - jb) < 1e-4, "JB replay")
    assert(r.getBoolean(4) == (r.getDouble(3) > 5.991),
      "verdict must compare the rounded JB to chi2(2)")
  }

  test("runs test: run accounting replays a sequential scan and the " +
      "moments match the closed forms") {
    val r = Series2Ops.qRunsTest(spark, sf).head()
    val sorted = series.sorted
    val n0 = series.length
    val med = (sorted((n0 + 1) / 2 - 1) + sorted((n0 + 2) / 2 - 1)) / 2.0
    val signs = series.filter(_ != med).map(_ > med)
    var runs = 1
    signs.sliding(2).foreach { w =>
      if (w.length == 2 && w(0) != w(1)) runs += 1 }
    val n1 = signs.count(identity); val n = signs.length
    assert(r.getLong(0) == n.toLong && r.getLong(1) == n1.toLong)
    assert(r.getLong(3) == runs.toLong, s"runs ${r.getLong(3)} vs $runs")
    val eR = 2.0 * n1 * (n - n1) / n + 1.0
    assert(math.abs(r.getDouble(4) - eR) < 1e-5)
  }

  test("binary quantize: codes carry real signal — recall beats random " +
      "by an order of magnitude and true neighbors sit below the " +
      "random Hamming midpoint") {
    val rows = graft.queries.Vector2Ops.qBinaryQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 10)
      // 64 balanced random bits put an unrelated vector at E[hd] = 32;
      // the true cosine top-10 must sit measurably below that
      assert(r.getDouble(3) < 32.0,
        s"qid ${r.getLong(0)} mean Hamming of true neighbors " +
          s"${r.getDouble(3)} not below the random midpoint")
    }
    val meanRecall = rows.map(_.getDouble(2)).sum / rows.length
    // random top-10 recall is ~10/n (~0.02 on this fixture)
    assert(meanRecall >= 0.2,
      s"mean recall@10 $meanRecall — binary codes lost the signal")
  }

  test("mmd poly: every label pair scored once, values non-negative, " +
      "and the linear MMD replays a driver-side moment computation") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.Vector2Ops.qMmdPoly(spark, sf).collect()
    val labels = Tables.df(spark, sf, "embeddings")
      .select(col("label")).distinct().count().toInt
    assert(rows.length == labels * (labels - 1) / 2,
      s"expected C($labels,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
      assert(r.getInt(0) < r.getInt(1), "pairs ordered la < lb")
    }
    // replay the (0,1) linear MMD: squared distance of the first-8-dim
    // mean vectors
    val byLab = Tables.df(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .groupBy(_.getInt(0).toLong)
      .map { case (l, rs) =>
        val vs = rs.map(_.getSeq[Float](1).take(8).map(_.toDouble))
        l -> (0 until 8).map(i =>
          vs.map(v => math.rint(v(i) * 1e12) / 1e12).sum / vs.length)
      }
    val want = (0 until 8).map { i =>
      val d = byLab(0L)(i) - byLab(1L)(i)
      math.rint(d * d * 1e12) / 1e12
    }.sum * 1e6
    val got = rows.find(r => r.getInt(0) == 0 && r.getInt(1) == 1)
      .get.getDouble(2)
    assert(math.abs(got - want) < 1e-3,
      s"linear MMD(0,1) $got vs driver replay $want")
  }

  test("ann filtered: every served neighbor shares the query's label, " +
      "ranks are contiguous, and sims are index-admitted") {
    import org.apache.spark.sql.functions.col
    val rows = graft.queries.Vector2Ops.qAnnFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    val lab = Tables.df(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      assert(lab(qid) == lab(nid) && lab(qid) == r.getInt(4),
        s"label mismatch: q=$qid n=$nid")
      assert(r.getDouble(3) >= 0.25, "only index-admitted candidates")
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"ranks $ranks")
      assert(ranks.length <= 3)
    }
  }

  test("recursive backlog: the native recursion replays the prefix-min " +
      "closed form (and a sequential scan) exactly") {
    val rows = graft.queries.SqlSurface2.qRecursiveBacklog(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.length >= 4, "one row per ISO week of the 30-day window")
    val arr = rows.map(_.getLong(2))
    val cap = arr.sum / arr.length // integer mean, as the query freezes it
    var b = 0L
    rows.zip(arr).foreach { case (r, a) =>
      b = math.max(0L, b + a - cap)
      assert(r.getLong(3) == b,
        s"t=${r.getInt(0)} backlog ${r.getLong(3)} vs sequential $b")
    }
    // the closed form: backlog_t = P_t - min(0, min_{j<=t} P_j),
    // P = running sum of (a - cap) — the q_cusum identity
    var p = 0L; var minP = 0L
    rows.zip(arr).foreach { case (r, a) =>
      p += a - cap; minP = math.min(minP, p)
      assert(r.getLong(3) == p - math.min(0L, minP),
        "recursion must equal the prefix-min closed form")
    }
  }

  test("unpivot: 4 metrics per region, and the long values recombine " +
      "into the wide aggregate") {
    val rows = graft.queries.SqlSurface2.qUnpivot(spark, sf).collect()
    val byRegion = rows.groupBy(_.getString(0))
    assert(byRegion.nonEmpty)
    byRegion.foreach { case (reg, rs) =>
      val metrics = rs.map(_.getString(1)).sorted
      assert(metrics.toSeq ==
        Seq("max_order", "n_customers", "n_orders", "total_rev"),
        s"$reg metrics $metrics")
      val m = rs.map(r => r.getString(1) -> r.getDouble(2)).toMap
      assert(m("n_orders") >= m("n_customers"),
        "a customer places >= 1 order in any counted region")
      assert(m("total_rev") >= m("max_order"), "sum bounds max")
    }
  }

  test("degree dist: node accounting matches a driver-side degree " +
      "recount and the fit is well-formed") {
    val r = graft.queries.GraphOps.qDegreeDist(spark, sf).head()
    val deg = graft.queries.GraphOps.coPurchaseEdgesLong(spark, sf)
      .groupBy(col("u")).count().collect().map(_.getLong(1))
    assert(r.getLong(0) == deg.length.toLong, "n_nodes")
    assert(r.getLong(2) == deg.min && r.getLong(3) == deg.max,
      "degree envelope")
    assert(r.getLong(1) == deg.distinct.length.toLong, "n_degrees")
    val r2 = r.getDouble(6)
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 out of range")
  }

  test("entropy rate: conditional entropy is non-negative and bounded " +
      "by the unigram vocabulary") {
    val rows = graft.queries.Corpus2Ops.qEntropyRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h1, h2, rate) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(h1 >= 0 && h2 >= h1 - 1e-9,
        s"${r.getString(0)}: joint entropy must dominate marginal")
      // h_rate rounds once from the raw difference; comparing the
      // two independently-rounded columns leaves up to 2 ulp at 6dp
      assert(math.abs(rate - (h2 - h1)) < 2e-6)
      assert(h1 <= math.log(r.getLong(2).toDouble) + 1e-6,
        "H1 bounded by ln(vocab)")
    }
  }

  test("qini: the curve accumulates to the full population and the " +
      "final uplift replays the overall treatment contrast") {
    val rows = graft.queries.DecisionOps.qQini(spark, sf).collect()
      .sortBy(_.getInt(0))
    // tied boundaries collapse deciles (quantile_cont ties), so ids are
    // distinct and in-range but not necessarily contiguous
    val ids = rows.map(_.getInt(0)).toSeq
    assert(ids == ids.distinct && ids.forall(d => d >= 1 && d <= 10))
    val fracs = rows.map(_.getDouble(2))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b >= a },
      "frac_targeted must be non-decreasing")
    assert(math.abs(fracs.last - 1.0) < 1e-9, "curve must end at 100%")
    // final-row uplift == overall conversion contrast, driver-side
    val users = Tables.df(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
      .collect()
    val (t, c) = users.partition(_.getLong(0) % 2 == 0)
    val want = t.count(_.getLong(1) > 0).toDouble / t.length -
      c.count(_.getLong(1) > 0).toDouble / c.length
    assert(math.abs(rows.last.getDouble(3) - want) < 1e-5,
      s"final uplift ${rows.last.getDouble(3)} vs driver $want")
  }

  test("anova2: the SS decomposition closes (SSA+SSB+SSAB+SSW = SST " +
      "within rounding) and the one-way marginal replays q_anova's " +
      "discipline") {
    val r = graft.queries.InferOps.qAnova2(spark, sf).head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 5L,
      "5 priorities x 5 segments")
    val ssa = r.getDouble(3)
    val ssb = r.getDouble(4)
    val ssab = r.getDouble(5)
    val ssw = r.getDouble(6)
    assert(ssa >= 0 && ssb >= 0 && ssw > 0, "marginal SS non-negative")
    // fA etc. finite and non-negative
    Seq(7, 8, 9).foreach { i =>
      val f = r.getDouble(i)
      assert(!f.isNaN && f >= 0, s"F at $i must be >= 0, got $f")
    }
    // the decomposition closes by construction (ssab/ssw are derived),
    // so check the INPUT consistency instead: cells-level SS >= each
    // marginal SS (adding factors cannot explain less)
    assert(ssa + ssb + ssab >= ssa - 1e-6 &&
      ssa + ssb + ssab >= ssb - 1e-6,
      "cell SS dominates each marginal SS")
    assert(!r.getBoolean(10), "parity-free design: no real interaction")
  }

  test("anderson-darling: A2 replays a driver-side computation over " +
      "the standardized sorted series") {
    val r = graft.queries.InferOps.qAndersonDarling(spark, sf).head()
    val n = series.length
    assert(r.getLong(0) == n.toLong)
    val mean = series.sum / n
    val sd = math.sqrt(series.map(v => {
      val q = v * v
      math.rint(q * 1e4) / 1e4
    }).sum / 1.0 match { case s2 =>
      (s2 - series.sum * series.sum / n) / (n - 1) })
    val zs = series.map(v =>
      math.rint((v - mean) / sd * 1e6) / 1e6).sorted
    def phi(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
        + t * (-1.821255978 + t * 1.330274429))))
      val pdf = math.exp(math.rint(-(az * az) / 2.0 * 1e9) / 1e9) *
        0.3989422804014327
      val c = 1.0 - pdf * poly
      if (z >= 0) c else 1.0 - c
    }
    var s1 = 0.0; var s2s = 0.0
    zs.zipWithIndex.foreach { case (z, i0) =>
      val i = i0 + 1
      val p = math.max(1e-12, math.min(1.0 - 1e-12,
        math.rint(phi(z) * 1e9) / 1e9))
      s1 += math.rint((2 * i - 1) *
        (math.rint(math.log(p) * 1e9) / 1e9) * 1e9) / 1e9
      s2s += math.rint((2 * (n - i) + 1) *
        (math.rint(math.log(1.0 - p) * 1e9) / 1e9) * 1e9) / 1e9
    }
    val a2 = math.rint((-n - (s1 + s2s) / n) * 1e6) / 1e6
    assert(math.abs(r.getDouble(1) - a2) < 1e-4,
      s"A2 ${r.getDouble(1)} vs driver replay $a2")
    assert(r.getDouble(2) >= r.getDouble(1) - 1e-9,
      "case-3 adjustment inflates A2 (positive A2)")
  }

  test("tail dep: joint exceedances are bounded by k and independence " +
      "is k/n") {
    val rows = graft.queries.Series2Ops.qTailDep(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (n, k, joint) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(joint >= 0 && joint <= k, s"joint $joint vs k $k")
      assert(math.abs(r.getDouble(5) - k.toDouble / n) < 1e-9)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("elasticity: the log-log fit is well-formed and replays a " +
      "driver-side OLS over the same rounded terms") {
    val r = graft.queries.Analytics.qElasticity(spark, sf).head()
    val parts = Tables.df(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("q"),
        sum(round(col("l_extendedprice"), 2)
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("rev"))
      .filter(col("q") > 0)
      .select(col("q").cast("double"), col("rev").cast("double"))
      .collect()
    val xy = parts.map { p =>
      val y = math.rint(math.log(p.getDouble(0)) * 1e6) / 1e6
      val x = math.rint(math.log(
        math.rint(p.getDouble(1) / p.getDouble(0) * 1e6) / 1e6) * 1e6) / 1e6
      (x, y)
    }
    val n = xy.length.toDouble
    assert(r.getLong(0) == xy.length.toLong)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 1e-3,
      s"slope ${r.getDouble(1)} vs replay $slope")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("block bootstrap: block starts replay bit-for-bit and the CI " +
      "brackets the point estimate") {
    val r = graft.queries.Series2Ops.qBlockBootstrap(spark, sf).head()
    val n = r.getLong(0).toInt
    assert(n == series.length)
    assert(r.getLong(1) == 5L && r.getLong(2) == 16L)
    val (est, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(lo <= hi, s"CI inverted: [$lo, $hi]")
    assert(est > 0, "revenue mean positive")
    // replay replicate 1's mean from the same md5 block starts
    def md5u(b: Int, k: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"blk:$b:$k".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(h, 16) + 1) / 1152921504606846976.0
    }
    val m1 = (1 to n).map { pos =>
      val k = (pos - 1) / 5
      val s = math.min(math.floor(md5u(1, k) * (n - 4)).toLong, n - 5L)
        .toInt + 1
      series(s + (pos - 1) % 5 - 1)
    }
    val want = math.rint(m1.sum / n * 1e6) / 1e6
    // pin the replay against the replicate-mean relation the query
    // ACTUALLY ranks (ADVICE r14: previously only range-checked)
    val days = graft.queries.SeriesOps.dailySeries(spark, sf)
      .localCheckpoint()
    val nm = days.agg(count(lit(1)).as("n"), sum($"y").as("sy"))
    val reps = Series2Ops.blockReplicates(spark, days, nm).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(reps.size == 16)
    assert(math.abs(reps(1) - want) < 1e-9,
      s"replicate 1 mean ${reps(1)} vs md5 block-start replay $want")
    // and the CI the query reports is exactly the 0.05/0.95
    // quantile_cont interpolation over those 16 replicate means
    val ms = reps.values.toArray.sorted
    val wantLo = math.rint((ms(0) + 0.75 * (ms(1) - ms(0))) * 1e6) / 1e6
    val wantHi = math.rint((ms(14) + 0.25 * (ms(15) - ms(14))) * 1e6) / 1e6
    assert(math.abs(lo - wantLo) < 1e-9, s"ci_lo $lo vs replay $wantLo")
    assert(math.abs(hi - wantHi) < 1e-9, s"ci_hi $hi vs replay $wantHi")
    assert(lo >= series.min - 1e-6 && hi <= series.max + 1e-6,
      "CI must lie within the value range")
  }

  test("pca deflate: pc1 matches q_pca_power and pc2 is near-orthogonal " +
      "with a real second direction") {
    val rows = graft.queries.Vector2Ops.qPcaDeflate(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 16)
    val pc1Here = rows.map(_.getDouble(1))
    val pc1Pub = graft.queries.VectorQueries.qPcaPower(spark, sf)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(3))
    pc1Here.zip(pc1Pub).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, "pc1 must be q_pca_power's vector") }
    val pc2 = rows.map(_.getDouble(2))
    val dot = rows.head.getDouble(4)
    val n1 = math.sqrt(pc1Here.map(v => v * v).sum)
    val n2 = math.sqrt(pc2.map(v => v * v).sum)
    assert(math.abs(dot) / (n1 * n2) < 0.05,
      s"pc2 not orthogonal to pc1: cos = ${dot / (n1 * n2)}")
    assert(rows.head.getDouble(3) > 0, "lambda1 positive on real data")
    // pc2 must not be pc1 in disguise
    val cosSame = pc1Here.zip(pc2).map(p => p._1 * p._2).sum / (n1 * n2)
    assert(math.abs(cosSame) < 0.1, "pc2 collapsed onto pc1")
  }

  test("km ci: the band brackets the published survival curve and " +
      "narrows with risk-set size") {
    val ci = graft.queries.EventOps.qKmCi(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    val curve = graft.queries.EventOps.qSurvival(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(ci.keySet == curve.keySet, "same time grid as q_survival")
    ci.foreach { case (t, r) =>
      val (s0, lo, hi) = (r.getDouble(3), r.getDouble(5), r.getDouble(6))
      assert(math.abs(s0 - curve(t)) < 1e-9,
        s"t=$t: the CI row must carry q_survival's exact curve value")
      assert(lo <= s0 + 1e-9 && s0 <= hi + 1e-9,
        s"t=$t band [$lo, $hi] must bracket $s0")
      assert(lo >= 0.0 && hi <= 1.0, "clamped to probability range")
    }
  }

  test("y scramble: the scrambled fit's R2 collapses relative to the " +
      "true fit") {
    val r = graft.queries.EvalOps.qYScramble(spark, sf).head()
    val (r2t, r2s) = (r.getDouble(1), r.getDouble(2))
    assert(r2t > 0.5,
      s"the true ridge fit must explain the fixture (r2 $r2t)")
    assert(math.abs(r2s) < r2t / 2.0,
      s"scrambled r2 $r2s did not collapse vs true $r2t — leakage " +
        "in the evaluation harness")
    assert(r.getBoolean(3), "the collapsed verdict must fire")
  }

  test("granger: the restricted model can never beat the unrestricted " +
      "(F >= 0) and coefficients are finite on the fixture") {
    val r = Series2Ops.qGranger(spark, sf).head()
    val n = r.getLong(0)
    assert(n >= 10, "fixture must give a usable lagged series")
    val ssrR = r.getDouble(3); val ssrU = r.getDouble(4)
    assert(ssrR >= ssrU - 1e-6,
      s"restricted SSR $ssrR must be >= unrestricted $ssrU (nesting)")
    val f = r.getDouble(5)
    assert(!f.isNaN && f >= -1e-9, s"F must be non-negative, got $f")
    assert(!r.isNullAt(1) && !r.isNullAt(2), "coefficients must exist")
    assert(r.getBoolean(6) == (f > 3.841),
      "verdict must compare rounded F to the asymptotic chi2(1) value")
  }
}
