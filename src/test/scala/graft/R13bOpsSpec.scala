package graft

import graft.queries.SeriesOps
import org.apache.spark.sql.functions._

/** Round-13 sequential-monitoring batch: each op's window/unroll closed
  * form is replayed against the plain sequential recursion it claims to
  * equal (the qSes precedent) — CUSUM's max(0, .) via the prefix-min
  * identity, Page–Hinkley's running-mean deviations, Mann–Kendall's
  * brute-force pair count, and Holt's two-state level/trend recursion. */
class R13bOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val daily: Seq[Double] =
    Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(round($"value", 2)).as("y"))
      .orderBy($"d")
      .select($"y".cast("double")).as[Double].collect().toSeq

  test("cusum: the prefix-min identity replays the tabular recursion") {
    val rows = SeriesOps.qCusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Double]("z"),
        r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"),
        r.getAs[Boolean]("alarm")))
      .sortBy(_._1)
    var sp = 0.0; var sn = 0.0
    rows.foreach { case (d, z, spOut, snOut, alarm) =>
      sp = math.max(0.0, sp + z - 0.5)
      sn = math.max(0.0, sn - z - 0.5)
      assert(math.abs(spOut - sp) < 1e-4, s"$d: S+ $spOut vs replay $sp")
      assert(math.abs(snOut - sn) < 1e-4, s"$d: S- $snOut vs replay $sn")
      assert(alarm == (spOut > 4.0 || snOut > 4.0))
    }
  }

  test("page-hinkley: the prefix-min form replays the running-mean " +
      "deviation recursion") {
    val rows = SeriesOps.qPageHinkley(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Double]("z"),
        r.getAs[Double]("z_runmean"), r.getAs[Double]("ph")))
      .sortBy(_._1)
    // PH_t = m_t - min_{1<=j<=t} m_j: the window holds emitted rows
    // only (no virtual m_0 = 0), matching the query's frame
    var cum = 0.0; var m = 0.0; var mMin = Double.MaxValue; var t = 0
    rows.foreach { case (d, z, zbar, ph) =>
      t += 1; cum += z
      assert(math.abs(zbar - cum / t) < 1e-4, s"$d: running mean")
      m += z - cum / t - 0.05
      mMin = math.min(mMin, m)
      val phReplay = m - mMin
      assert(math.abs(ph - phReplay) < 1e-3, s"$d: PH $ph vs $phReplay")
      assert(ph >= -1e-9, "PH is non-negative by construction")
    }
  }

  test("mann-kendall: S, Var(S) and z replay the brute-force pair count") {
    val row = SeriesOps.qMannKendall(spark, sf).collect().head
    val y = daily
    val n = y.size
    assert(row.getAs[Long]("n") == n)
    val s = (for (i <- 0 until n; j <- i + 1 until n)
      yield math.signum(y(j) - y(i)).toLong).sum
    assert(row.getAs[Long]("s") == s)
    val ties = y.groupBy(identity).values.map(_.size.toLong)
    val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tieTerm) / 18.0
    assert(math.abs(row.getAs[Double]("var_s") - varS) < 1e-4)
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-4)
    val trend = row.getAs[String]("trend")
    assert(trend == (if (z > 1.959964) "increasing"
      else if (z < -1.959964) "decreasing" else "no_trend"))
  }

  test("closeness: landmark distance sums replay a driver-side BFS, " +
      "and the estimate is k over the sum") {
    val edges = graft.queries.GraphOps.coPurchaseEdgesLong(spark, sf)
      .as[(Long, Long)].collect()
    val adj = edges.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2).toSet }
    def bfs(src: Long): Map[Long, Int] = {
      var dist = Map(src -> 0)
      var frontier = Set(src)
      for (lvl <- 1 to 4) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> lvl)
      }
      dist
    }
    def decode(n: Long): String =
      (if (n % 2 == 0) "c:" else "s:") + (n >> 1)
    val nodes = adj.keySet
    def md5Head15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val landmarks = nodes.toSeq
      .sortBy(n => (md5Head15(decode(n)), decode(n)))
      .take(10)
    val trees = landmarks.map(l => l -> bfs(l)).toMap
    val rows = graft.queries.GraphOps.qCloseness(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val ns = r.getString(0)
      val id = ns.drop(2).toLong * 2 + (if (ns.startsWith("s:")) 1 else 0)
      val ds = landmarks.flatMap(l => trees(l).get(id))
      assert(ds.size == 10, s"$ns must reach all landmarks")
      assert(r.getAs[Long]("sum_d") == ds.sum.toLong,
        s"$ns: landmark distance sum")
      assert(math.abs(r.getAs[Double]("closeness") - 10.0 / ds.sum) < 1e-5)
      val h = ds.filter(_ > 0).map(1.0 / _).sum / 10.0
      assert(math.abs(r.getAs[Double]("harmonic") - h) < 1e-5)
    }
  }

  test("graph radius: bounds are the extrema of the eccentricity " +
      "column and every landmark reaches the whole graph") {
    val rows = graft.queries.GraphOps.qGraphRadius(spark, sf).collect()
    assert(rows.length == 10)
    val eccs = rows.map(_.getAs[Int]("ecc"))
    rows.foreach { r =>
      assert(r.getAs[Int]("diameter_lb") == eccs.max)
      assert(r.getAs[Int]("radius_ub") == eccs.min)
      assert(r.getAs[Int]("ecc") >= 1 && r.getAs[Int]("ecc") <= 4)
      assert(r.getAs[Long]("n_reached") >= 1L)
    }
  }

  test("conformal: the split partitions the order relation and " +
      "held-out coverage lands near the 90% guarantee") {
    val row = graft.queries.EvalOps.qConformal(spark, sf).collect().head
    // the unit is orders WITH lineitems (the ridge feature relation)
    val total = Tables.df(spark, sf, "lineitem")
      .select($"l_orderkey").distinct().count()
    val n = row.getAs[Long]("n_train") + row.getAs[Long]("n_calib") +
      row.getAs[Long]("n_test")
    assert(n == total, "train+calib+test must partition the orders")
    assert(row.getAs[Double]("q_hat") > 0.0)
    val cov = row.getAs[Double]("coverage")
    assert(cov >= 0.8 && cov <= 1.0,
      s"marginal coverage $cov should sit near the 1-alpha target")
    assert(math.abs(row.getAs[Double]("mean_width")
      - 2 * row.getAs[Double]("q_hat")) < 2e-4)
  }

  test("perm importance: baseline delta is zero and permuting an " +
      "informative feature cannot shrink the MSE") {
    val rows = graft.queries.EvalOps.qPermImportance(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("mse"),
        r.getAs[Double]("delta_frac"))).toMap
    assert(rows.keySet == Set("none", "x_lines", "x_qty"))
    assert(rows("none")._2 == 0.0)
    assert(rows("x_lines")._2 > 0.0,
      "permuting an informative feature must raise MSE")
    assert(rows("x_qty")._2 > 0.0,
      "permuting an informative feature must raise MSE")
  }

  test("impute: the fill is the exact survivor median and the masked " +
      "share is about a fifth per type") {
    val rows = graft.queries.EvalOps.qImpute(spark, sf).collect()
    assert(rows.nonEmpty)
    def md5Head15(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ev = Tables.df(spark, sf, "events")
      .select($"event_id", $"event_type",
        round($"value", 2).cast("decimal(18,2)").as("v"))
      .as[(Long, String, java.math.BigDecimal)].collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val (masked, surv) = ev.filter(_._2 == t)
        .partition(e => md5Head15(s"imp:${e._1}") % 5 == 0)
      assert(r.getAs[Long]("n_masked") == masked.length)
      val sv = surv.map(_._3.doubleValue).sorted
      val mid = (sv((sv.length - 1) / 2) + sv(sv.length / 2)) / 2
      assert(math.abs(r.getAs[Double]("median_fill") - mid) < 1e-3,
        s"$t: fill must be the survivor median")
      assert(r.getAs[Double]("rmse") >= r.getAs[Double]("mae") - 1e-9,
        "RMSE dominates MAE")
    }
  }

  test("shapley: the efficiency axiom holds — channel values sum to " +
      "v(full) minus v(empty)") {
    val rows = graft.queries.DecisionOps.qShapley(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("phi")).toMap
    val channels = rows.keySet - "__total"
    assert(channels == Set("click", "error", "signup", "view"))
    val sum = channels.toSeq.map(rows).sum
    assert(math.abs(sum - rows("__total")) < 1e-4,
      s"sum of shapley values $sum must equal the total ${rows("__total")}")
  }

  test("bayes ab: the normal-cdf approximation hits known quantiles " +
      "and the interval brackets the lift") {
    import graft.queries.DecisionOps
    val probe = spark.range(1)
      .select(DecisionOps.normCdf(lit(0.0)).as("p0"),
        DecisionOps.normCdf(lit(1.959964)).as("p1"),
        DecisionOps.normCdf(lit(-1.959964)).as("p2")).head()
    assert(math.abs(probe.getDouble(0) - 0.5) < 1e-6)
    assert(math.abs(probe.getDouble(1) - 0.975) < 1e-4)
    assert(math.abs(probe.getDouble(2) - 0.025) < 1e-4)
    val row = DecisionOps.qBayesAb(spark, sf).collect().head
    val p = row.getAs[Double]("prob_b_better")
    assert(p > 0.0 && p < 1.0)
    assert(row.getAs[Double]("ci_lo") <= row.getAs[Double]("lift"))
    assert(row.getAs[Double]("lift") <= row.getAs[Double]("ci_hi"))
    val dec = row.getAs[String]("decision")
    assert(dec == (if (p > 0.95) "ship_b"
      else if (p < 0.05) "ship_a" else "continue"))
  }

  test("poisson rate: z replays the conditional binomial score from " +
      "the emitted counts") {
    val r = graft.queries.DecisionOps.qPoissonRate(spark, sf)
      .collect().head
    val (kWe, dWe, kWd, dWd) = (r.getAs[Long]("k_we"),
      r.getAs[Long]("d_we"), r.getAs[Long]("k_wd"), r.getAs[Long]("d_wd"))
    assert(dWe + dWd == 30, "the fixture calendar is 30 days")
    val n = (kWe + kWd).toDouble
    val p0 = dWe.toDouble / (dWe + dWd)
    val z = (kWe - n * p0) / math.sqrt(n * p0 * (1 - p0))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-4)
    assert(r.getAs[Boolean]("significant") ==
      (math.abs(r.getAs[Double]("z")) > 1.959964))
  }

  test("ecod: scores replay the driver-side tail-rank computation") {
    val emb = Tables.df(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val n = emb.length
    val byDim = (0 until 8).map { j =>
      val xs = emb.map(e => e._1 -> e._2(j).toDouble)
      val sorted = xs.map(_._2).sorted
      j -> xs.map { case (id, x) =>
        val cle = sorted.count(_ <= x)
        val cge = sorted.count(_ >= x)
        id -> -math.log(math.min(cle, cge).toDouble / n)
      }.toMap
    }.toMap
    val scores = emb.map { case (id, _) =>
      id -> (0 until 8).map(j => byDim(j)(id)).sum }.toMap
    val rows = graft.queries.VectorQueries.qEcod(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("ecod_score") - scores(id)) < 1e-3,
        s"vec $id score")
    }
    // the emitted 20 really are the top 20
    val cutoff = rows.map(_.getAs[Double]("ecod_score")).min
    val better = scores.values.count(_ > cutoff + 1e-6)
    assert(better <= 20, "no vector outside the top-20 scores higher")
  }

  test("bm25 tune: the grid is a ranked permutation, nDCG is bounded, " +
      "and the tf-weighted qrels actually discriminate") {
    val rows = graft.queries.CorpusOps.qBm25Tune(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to 6))
    val means = rows.sortBy(_.getAs[Int]("rk"))
      .map(_.getAs[Double]("mean_ndcg"))
    means.foreach(m => assert(m > 0.0 && m <= 1.0, s"ndcg $m in (0,1]"))
    assert(means.zip(means.tail).forall { case (a, b) => a >= b },
      "ranked by mean nDCG desc")
    assert(means.distinct.length >= 2,
      "the advisor must discriminate between grid cells — a saturated " +
        "all-1.0 column means the qrels grade too coarsely")
    val cells = rows.map(r => (r.getAs[Double]("k1"), r.getAs[Double]("b")))
    assert(cells.toSet == Set((0.6, 0.3), (0.6, 0.75), (1.2, 0.3),
      (1.2, 0.75), (1.8, 0.3), (1.8, 0.75)))
  }

  test("ann multiprobe: the probe fan-out dominates single-probe " +
      "recall band-by-band and its candidate set is a superset") {
    val rows = graft.queries.VectorQueries.qAnnMultiprobe(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, f1, fm) = (r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_found_1p"), r.getAs[Long]("n_found_mp"))
      assert(f1 <= fm, "single-probe hits are a subset (j = -1 probe)")
      assert(fm <= nt, "found cannot exceed truth")
      assert(r.getAs[Double]("recall_mp") >=
        r.getAs[Double]("recall_1p"))
      assert(r.getAs[Long]("n_cand_mp") >= r.getAs[Long]("n_cand_1p"),
        "the recall lift is paid for in candidates")
    }
    assert(rows.exists(r => r.getAs[Double]("recall_mp") >
      r.getAs[Double]("recall_1p")),
      "multi-probe must actually add recall somewhere")
  }

  test("mediation: the OLS effect decomposition is exact — total " +
      "equals direct plus indirect") {
    val r = graft.queries.DecisionOps.qMediation(spark, sf).collect().head
    val total = r.getAs[Double]("total")
    val direct = r.getAs[Double]("direct")
    val indirect = r.getAs[Double]("indirect")
    // c = c' + a·b holds exactly in-sample for OLS; only 6dp rounding
    // separates the emitted columns
    assert(math.abs(total - direct - indirect) < 5e-6,
      s"$total != $direct + $indirect")
    val z = r.getAs[Double]("sobel_z")
    assert(r.getAs[Boolean]("significant") == (math.abs(z) > 1.959964))
    assert(r.getAs[Long]("n") > 100)
  }

  test("psm att: matching replays a driver-side nearest-neighbor pass " +
      "over the same propensities") {
    val ev = Tables.df(spark, sf, "events")
      .select($"user_id", $"event_type", round($"value", 2).as("v"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    val acts = ev.map { case (uid, rows) =>
      val nv = rows.count(_.getString(1) == "view").toLong
      val nc = rows.count(_.getString(1) == "click").toLong
      val ns = rows.count(_.getString(1) == "signup").toLong
      val y = rows.filter(_.getString(1) == "purchase")
        .map(r => BigDecimal(r.getAs[Double](2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (uid, nv + 2 * nc, ns, y.toDouble)
    }.toSeq
    val n = acts.size
    val sns = acts.map(_._3).sum
    val ss = acts.map(_._2).sum
    val ss2 = acts.map(a => a._2 * a._2).sum
    val mu = ss.toDouble / n
    val sd = math.sqrt((ss2.toDouble - ss.toDouble * ss / n) / (n - 1))
    def rnd(x: Double, k: Int) =
      BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble
    val users = acts.map { case (uid, s, ns, y) =>
      (uid, ns * n > sns,
        rnd(1.0 / (1.0 + math.exp(rnd(-((s - mu) / sd), 9))), 6), y)
    }
    val cg = users.filter(!_._2).groupBy(_._3).map { case (pc, g) =>
      pc -> rnd(g.map(u => rnd(u._4, 6)).sum / g.size, 6)
    }
    val tr = users.filter(_._2)
    val diffs = tr.flatMap { case (_, _, p, y) =>
      val cand = cg.toSeq
        .filter(c => rnd(math.abs(p - c._1), 6) <= 0.05)
        .sortBy(c => (rnd(math.abs(p - c._1), 6),
          if (c._1 <= p) 0 else 1, c._1))
      cand.headOption.map { case (_, yb) => rnd(y - yb, 6) }
    }
    val r = graft.queries.DecisionOps.qPsmAtt(spark, sf).collect().head
    assert(r.getAs[Long]("n_treated") == tr.size)
    assert(r.getAs[Long]("n_matched") == diffs.size)
    val att = diffs.sum / diffs.size
    assert(math.abs(r.getAs[Double]("att") - att) < 1e-4,
      s"att ${r.getAs[Double]("att")} vs replay $att")
    assert(r.getAs[Double]("mean_abs_pdiff") <= 0.05)
  }

  test("crosscorr: per-lag overlap counts are calendar-exact and lag 0 " +
      "replays a driver-side Pearson") {
    val rows = SeriesOps.qCrosscorr(spark, sf).collect()
      .map(r => (r.getAs[Int]("lag"), r.getAs[Long]("n"),
        r.getAs[Double]("r"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (-7 to 7))
    rows.foreach { case (lag, n, r) =>
      assert(n == 30 - math.abs(lag), s"overlap at lag $lag")
      assert(math.abs(r) <= 1.0 + 1e-9)
    }
    val dd = Tables.df(spark, sf, "events")
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"),
        sum(when($"event_type" === "purchase", round($"value", 2))).as("y"))
      .collect().map(r => (r.getAs[Long]("x").toDouble,
        r.getAs[Double]("y")))
    val n = dd.length
    val (sx, sy) = (dd.map(_._1).sum, dd.map(_._2).sum)
    val sxx = dd.map(p => p._1 * p._1).sum
    val syy = dd.map(p => p._2 * p._2).sum
    val sxy = dd.map(p => p._1 * p._2).sum
    val r0 = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rows.find(_._1 == 0).get._3 - r0) < 1e-4)
  }

  test("huber: IRLS downweights outlying days — weight mass below n " +
      "unless nothing is outlying, scale positive, slopes finite") {
    val r = SeriesOps.qHuber(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    val wm = r.getAs[Double]("weight_mass")
    assert(n == 30)
    assert(r.getAs[Double]("huber_c") > 0)
    assert(wm > 0 && wm <= n + 1e-9,
      "huber weights are in (0, 1] so their mass cannot exceed n")
    Seq("ols_slope", "huber_slope", "ols_intercept", "huber_intercept")
      .foreach(c => assert(!r.getAs[Double](c).isNaN))
    // the robust fit must genuinely differ from OLS when any weight < 1
    if (wm < n - 1e-6)
      assert(r.getAs[Double]("huber_slope") !=
        r.getAs[Double]("ols_slope"))
  }

  test("topic coherence: terms replay the UMass formula over the " +
      "selected topic terms") {
    val tt = graft.queries.CorpusOps.qTopicTerms(spark, sf)
      .select($"source", $"rk", $"tok").collect()
      .map(r => (r.getString(0), r.getAs[Int](1), r.getString(2)))
    val sel = tt.map(_._3).toSet
    val docs = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val dt = docs.map { case (id, text) =>
      id -> text.toLowerCase.split(" ").filter(_.nonEmpty)
        .toSet.intersect(sel)
    }.toMap
    def dcount(t: String) = dt.values.count(_.contains(t))
    def dco(a: String, b: String) =
      dt.values.count(s => s.contains(a) && s.contains(b))
    val expected = tt.groupBy(_._1).map { case (src, terms) =>
      val byRk = terms.sortBy(_._2)
      val pairs = for {
        m <- byRk; l <- byRk if m._2 > l._2
      } yield math.log((dco(m._3, l._3) + 1).toDouble / dcount(l._3))
      src -> pairs.sum
    }
    val rows = graft.queries.CorpusOps.qTopicCoherence(spark, sf)
      .collect()
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("n_pairs") == 3)
      assert(math.abs(r.getAs[Double]("coherence") - expected(src)) < 1e-4,
        s"coherence of $src")
    }
  }

  test("holt: the matrix-power unroll replays the level/trend " +
      "recursion, and forecasts extrapolate the last state") {
    val rows = SeriesOps.qHolt(spark, sf).collect()
      .map(r => (r.getInt(1), Option(r.getAs[Any]("y")).map(_.toString.toDouble),
        r.getAs[Double]("fitted")))
      .sortBy(_._1)
    val y = daily
    val (alpha, beta) = (0.3, 0.1)
    var l = y(0); var b = y(1) - y(0)
    val fittedByT = scala.collection.mutable.Map[Int, Double]()
    for (t <- 2 to y.size) {
      fittedByT(t) = l + b // one-step-ahead from state at t-1
      val lNew = alpha * y(t - 1) + (1 - alpha) * (l + b)
      b = beta * (lNew - l) + (1 - beta) * b
      l = lNew
    }
    val (obs, fc) = rows.partition(_._1 <= y.size)
    assert(obs.size == y.size - 2, "fitted rows start at t = 3")
    obs.foreach { case (t, yOut, fitted) =>
      assert(yOut.isDefined && math.abs(yOut.get - y(t - 1)) < 1e-6)
      assert(math.abs(fitted - fittedByT(t)) < 1e-3,
        s"t=$t: fitted $fitted vs replay ${fittedByT(t)}")
    }
    assert(fc.size == 7, "a 7-day forecast horizon")
    fc.sortBy(_._1).zipWithIndex.foreach { case ((t, yOut, fitted), i) =>
      assert(yOut.isEmpty, "forecast rows carry no observation")
      assert(t == y.size + i + 1)
      assert(math.abs(fitted - (l + (i + 1) * b)) < 1e-3,
        s"h=${i + 1}: forecast must be l_T + h b_T")
    }
  }
}
