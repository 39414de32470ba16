package graft

import java.sql.Timestamp

import graft.queries.{CurateOps, DecisionOps, PipelineOps, SketchOps,
  StatsOps, TextOps}
import graft.functions.TextFunctions
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-13 batch invariants, starting with the HLL streaming twin's
  * merge law — the last sketch in the family to gain a batch/stream
  * symmetry proof (the CMS/DDSketch precedent, but with MAX-merge
  * instead of SUM-merge: HLL registers merge by register-wise max). */
class R13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hll stream: register-max across windows equals the one-pass " +
      "batch registers of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.df(spark, sf, "events")
      .select($"ts".cast("timestamp").as[Timestamp],
        $"user_id".cast("string").as[String])
      .collect().toSeq
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Timestamp, String)]
    val q = Streams.hllStream(input.toDF().toDF("ts", "item"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // the HLL merge is register-wise MAX (idempotent — a bucket seen
      // in many windows keeps its largest rho), not the CMS's sum
      val merged = spark.table("hll_stream")
        .groupBy($"bucket").agg(max($"m_j").as("m_j"))
        .as[(Long, Int)].collect().toMap
      val batch = SketchOps.hllRegs(
          Tables.df(spark, sf, "events")
            .select($"user_id".cast("string").as("tok")))
        .as[(Long, Int)].collect().toMap
      assert(merged == batch,
        s"stream-merged HLL registers (${merged.size}) must equal the " +
          s"batch registers (${batch.size})")
      // a real sketch, not a degenerate one: multiple buckets occupied
      // (sf0.001's ~50 distinct users land in ~15 of the 256 buckets)
      assert(batch.size > 4 && batch.size <= 256)
    } finally q.stop()
  }

  test("curation e2e: per-stage counts reconcile with the standalone " +
      "gates (quality, canonical survivorship, decontaminate, split)") {
    val e2e = CurateOps.qCurationE2e(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // recompute every gate from the STANDALONE registered ops' outputs —
    // the funnel must be their composition, not a parallel re-derivation
    val flags = TextOps.qQuality(spark, sf)
      .filter($"doc_id" % 10 === 0).select($"doc_id", $"score")
      .join(CurateOps.qCanonical(spark, sf).select($"doc_id", $"keep"),
        "doc_id")
      .join(TextOps.qDecontaminate(spark, sf), Seq("doc_id"), "left")
      .join(CurateOps.qSplitLeakproof(spark, sf)
        .select($"doc_id", $"split"), "doc_id")
      .select($"doc_id", ($"score" >= 0.5).as("g1"), $"keep",
        coalesce($"contaminated", lit(false)).as("cont"),
        ($"doc_id" % 97 === 0).as("bench"), $"split")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)].collect()
    val n0 = flags.length.toLong
    val k1 = flags.count(_._2).toLong
    val g2 = flags.filter(f => f._2 && f._3)
    val g3 = g2.filter(f => !f._4 && !f._5)
    assert(e2e("0_subset") == ((n0, n0)))
    assert(e2e("1_quality") == ((n0, k1)))
    assert(e2e("2_near_dup") == ((k1, g2.length.toLong)))
    assert(e2e("3_decontam") == ((g2.length.toLong, g3.length.toLong)))
    for (s <- Seq("train", "val", "test"))
      assert(e2e(s"4_split_$s") ==
        ((g3.length.toLong, g3.count(_._6 == s).toLong)),
        s"split $s partition must match the standalone split op")
    // the split rows partition the final survivors exactly
    assert(Seq("train", "val", "test").map(s => e2e(s"4_split_$s")._2).sum
      == g3.length.toLong)
    // a funnel that never drops anything tests nothing: the near-dup
    // gate must fire (the fixture plants near-duplicates) and the whole
    // funnel must show attrition. The quality and decontamination gates
    // only bite from sf0.01 up (at sf0.001 all 50 subset docs score
    // >= 0.5 and none shares a 5-gram with the benchmark docs) — the
    // sf0.01 driver run plus the hash oracle cover those.
    assert(g2.length < k1, "the near-dup gate must drop something")
    assert(g3.length < n0, "the funnel must show attrition end to end")
  }

  test("fellegi-sunter: decision classes order by truth precision " +
      "(link >= possible >= non_link) and partition the candidates") {
    val rows = CurateOps.qFellegiSunter(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // every decision class present on the fixture's planted dups
    assert(rows.keySet.subsetOf(Set("link", "possible", "non_link")))
    def prec(k: String) = rows.get(k).map(_._3)
    // the whole point of the weights: truth precision must be ordered
    for (hi <- prec("link"); mid <- prec("possible")) assert(hi >= mid)
    for (mid <- prec("possible"); lo <- prec("non_link")) assert(mid > lo)
    // counts reconcile: matches in classes sum to all truth matches
    assert(rows.values.map(_._1).sum > 0)
  }

  test("dbscan grid: rows partition the points and match a brute-force " +
      "replay of the density rule") {
    val rows = CurateOps.qDbscanGrid(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pts = Tables.df(spark, sf, "embeddings")
      .filter(size($"embedding") >= 2)
      .select(
        (round(round($"embedding".getItem(0).cast("double"), 6) * 1e6, 0)
          .cast("long") + 1000000L),
        (round(round($"embedding".getItem(1).cast("double"), 6) * 1e6, 0)
          .cast("long") + 1000000L))
      .as[(Long, Long)].collect()
    assert(rows.map(_._2).sum == pts.length,
      "cluster + noise points must partition the population")
    // brute-force replay with the identical integer rule
    val n = pts.length
    def d2(i: Int, j: Int) = {
      val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
      dx * dx + dy * dy
    }
    val eps2 = 20000L * 20000L
    val nbrs = Array.tabulate(n)(i =>
      (0 until n).filter(j => j != i && d2(i, j) <= eps2))
    val core = (0 until n).filter(i => nbrs(i).size >= 4).toSet
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int =
      if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
    for (i <- core; j <- nbrs(i) if core(j)) parent(find(i)) = find(j)
    val nClusters = core.map(find).size
    val border = (0 until n).count(i => !core(i) && nbrs(i).exists(core))
    val noise = n - core.size - border
    assert(rows.count(_._1 != "noise") == nClusters,
      s"cluster count must match brute force ($nClusters)")
    assert(rows.filter(_._1 != "noise").map(_._3).sum == core.size)
    assert(rows.filter(_._1 != "noise").map(_._4).sum == border)
    assert(rows.find(_._1 == "noise").map(_._2).getOrElse(0L) == noise)
  }

  test("raking: two IPF cycles land both margins near uniform") {
    val rows = PipelineOps.qRaking(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val nAll = rows.map(_._3).sum.toDouble
    val byLang = rows.groupBy(_._1).view
      .mapValues(_.map(c => c._3 * c._4).sum).toMap
    val bySource = rows.groupBy(_._2).view
      .mapValues(_.map(c => c._3 * c._4).sum).toMap
    val tgtL = nAll / byLang.size
    val tgtS = nAll / bySource.size
    // the final adjustment fits the source margin exactly; lang (fitted
    // one step earlier) must be within IPF's 2-cycle convergence band
    bySource.values.foreach(v => assert(math.abs(v - tgtS) / tgtS < 0.01))
    byLang.values.foreach(v => assert(math.abs(v - tgtL) / tgtL < 0.05))
  }

  test("pps sample: expected-size band and HT estimate in range") {
    val row = PipelineOps.qPpsSample(spark, sf).collect().head
    val nSample = row.getAs[Long]("n_sample")
    // E[n] = 200 less the mass of pi-capped orders; Poisson spread
    assert(nSample > 100 && nSample < 320, s"n_sample $nSample")
    assert(row.getAs[Double]("rel_err") < 0.25,
      "HT must land within 25% of the true total on this fixture")
  }

  test("cmh: stratified test consistent (chi2 vs bar, odds ratio " +
      "positive, k = segment count)") {
    val row = DecisionOps.qCmh(spark, sf).collect().head
    val chi2 = row.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(row.getAs[Boolean]("significant") == (chi2 > 3.841))
    assert(row.getAs[Double]("or_mh") > 0.0)
    val k = Tables.df(spark, sf, "customer")
      .select($"c_mktsegment").distinct().count()
    assert(row.getAs[Long]("k") == k)
  }

  test("prop trend: z consistent with its significance flag") {
    val row = DecisionOps.qPropTrend(spark, sf).collect().head
    val z = row.getAs[Double]("z")
    assert(!z.isNaN)
    assert(row.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
  }

  test("stl anomaly: robust z centers the residuals and the flag " +
      "follows |z| > 3") {
    val rows = StatsOps.qStlAnomaly(spark, sf).collect()
    assert(rows.length == StatsOps.qStlLite(spark, sf).count())
    val scores = rows.map(_.getAs[Double]("score"))
    // median-centered: both signs well represented
    assert(scores.count(_ <= 0) >= rows.length / 2 - 1)
    assert(scores.count(_ >= 0) >= rows.length / 2 - 1)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("anomaly")
        == (math.abs(r.getAs[Double]("score")) > 3.0))
    }
  }

  test("capture-recapture: samples bounded by truth and the Chapman " +
      "closed form replays") {
    val row = CurateOps.qCaptureRecapture(spark, sf).collect().head
    val (nt, n1, n2, m) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(n1 <= nt && n2 <= nt, "detector captures are truth samples")
    assert(m <= math.min(n1, n2), "overlap bounded by both captures")
    val chapman = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0
    assert(math.abs(row.getAs[Double]("chapman_est")
      - math.rint(chapman * 1e4) / 1e4) < 1e-9)
  }

  test("partial corr: bounded and consistent with Yule's formula over " +
      "the reported pairwise correlations") {
    val row = StatsOps.qPartialCorr(spark, sf).collect().head
    val (rxy, rxz, ryz, part) = (row.getAs[Double]("r_xy"),
      row.getAs[Double]("r_xz"), row.getAs[Double]("r_yz"),
      row.getAs[Double]("r_xy_given_z"))
    Seq(rxy, rxz, ryz, part).foreach(r => assert(math.abs(r) <= 1.0))
    val expect = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    // reported r's are rounded to 6dp, so the replay tolerates ~1e-5
    assert(math.abs(part - expect) < 1e-4)
  }

  test("gumbel fit: return levels order and positive scale") {
    val row = StatsOps.qGumbelFit(spark, sf).collect().head
    assert(row.getAs[Double]("beta") > 0.0)
    val rl30 = row.getAs[Double]("return_level_30")
    val rl365 = row.getAs[Double]("return_level_365")
    assert(rl365 > rl30, "rarer events must be larger")
    assert(rl30 > row.getAs[Double]("mean_max"))
  }

  test("ses: the closed form replays the sequential level recursion") {
    val rows = StatsOps.qSes(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.head._3.isEmpty, "no forecast for the first day")
    var l = rows.head._2 // l_1 = y_1
    rows.tail.foreach { case (_, y, fitted) =>
      assert(fitted.isDefined)
      assert(math.abs(fitted.get - l) < 1e-3,
        s"fitted must equal the prior level: ${fitted.get} vs $l")
      l = 0.3 * y + 0.7 * l
    }
  }

  test("mixture em: ordered components, valid mixing weight, and the " +
      "mixture mean reproduces the sample mean") {
    val row = StatsOps.qMixtureEm(spark, sf).collect().head
    val (pi, mu1, mu2, sigma) = (row.getAs[Double]("pi1"),
      row.getAs[Double]("mu1"), row.getAs[Double]("mu2"),
      row.getAs[Double]("sigma"))
    assert(pi > 0.0 && pi < 1.0)
    assert(mu2 > mu1, "components keep their quantile-init order")
    assert(sigma > 0.0)
    val mean = Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(sum(round($"value", 2)).as("x"))
      .agg(avg($"x")).head().getDouble(0)
    // each M-step conserves the total mass: pi*mu1 + (1-pi)*mu2 = mean
    assert(math.abs(pi * mu1 + (1 - pi) * mu2 - mean) < 0.05,
      "the mixture mean must reproduce the sample mean")
  }

  test("negbin fit: grid covers users x days, ratios reconcile, and " +
      "the near-Poisson fixture reads as barely overdispersed") {
    val row = StatsOps.qNegbinFit(spark, sf).collect().head
    val ev = Tables.df(spark, sf, "events")
    val users = ev.select($"user_id").distinct().count()
    val days = ev.select(to_date($"ts")).distinct().count()
    assert(row.getAs[Long]("n") == users * days)
    val (m, v) = (row.getAs[Double]("mean"), row.getAs[Double]("variance"))
    assert(math.abs(row.getAs[Double]("dispersion") - v / m) < 1e-4)
    assert(row.getAs[Boolean]("overdispersed") == (v > m))
    assert(math.abs(row.getAs[Double]("p0_observed")
      - row.getAs[Long]("zeros").toDouble / row.getAs[Long]("n")) < 1e-5)
    // the q_burstiness near-Poisson fixture reading, re-pinned here
    assert(row.getAs[Double]("dispersion") < 1.5)
  }

  test("hurst: R/S grows with block size and H is a valid exponent") {
    val row = StatsOps.qHurst(spark, sf).collect().head
    assert(row.getAs[Long]("n_sizes") == 4)
    val rs = Seq("rs_5", "rs_10", "rs_15", "rs_30")
      .map(row.getAs[Double](_))
    assert(rs.sliding(2).forall(p => p(1) > p(0)),
      "rescaled range must grow with block size")
    val h = row.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0, s"H $h must be a valid exponent")
  }

  test("quantile norm: normalized values come from the pooled score " +
      "set and are monotone in within-source rank") {
    val rows = PipelineOps.qQuantileNorm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty && rows.forall(r => !r._4.isNaN))
    val pooled = rows.map(r => math.round(r._3 * 1e6)).toSet
    rows.foreach { r =>
      assert(pooled.contains(math.round(r._4 * 1e6)),
        s"normalized ${r._4} must be an observed pooled score")
    }
    rows.groupBy(_._2).values.foreach { src =>
      val sorted = src.sortBy(r => (r._3, r._1)).map(_._4)
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(1) >= p(0) - 1e-9),
        "normalization must preserve within-source order")
    }
  }

  test("iv wald: the parity pseudo-instrument is flagged weak (the " +
      "Staiger-Stock gate fires on a null first stage)") {
    val r = DecisionOps.qIvWald(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Boolean]("weak"),
      "an id-parity instrument must never pass the F >= 10 bar")
    // the first-stage F must actually be computed (not null-coalesced)
    assert(!row.isNullAt(row.fieldIndex("first_stage_f")))
  }

  test("reg discontinuity: both sides populated, fitted, and the " +
      "effect is the intercept jump") {
    val row = DecisionOps.qRegDiscontinuity(spark, sf).collect().head
    assert(row.getAs[Long]("n_l") > 0 && row.getAs[Long]("n_r") > 0)
    val effect = row.getAs[Double]("effect")
    val jump = row.getAs[Double]("icept_right") -
      row.getAs[Double]("icept_left")
    assert(math.abs(effect - jump) < 2e-6,
      "effect must equal the intercept difference at the cutoff")
  }

  test("simpsons: pooled row present and stratum flip flags match the " +
      "sign rule") {
    val rows = DecisionOps.qSimpsons(spark, sf).collect()
    val all = rows.find(_.getString(0) == "ALL").get
    assert(!all.getAs[Boolean]("flipped"), "the pooled row never flips")
    val dAll = all.getAs[Double]("diff")
    rows.filter(_.getString(0) != "ALL").foreach { r =>
      val d = r.getAs[Double]("diff")
      // rounded-at-6dp signs only decide the flag away from zero
      if (math.abs(d) > 1e-5 && math.abs(dAll) > 1e-5)
        assert(r.getAs[Boolean]("flipped") == (d * dAll < 0),
          s"stratum ${r.getString(0)} flip flag must follow the signs")
    }
  }

  test("tukey hsd: k(k-1)/2 pairs, and significance agrees with the " +
      "derived critical value") {
    val rows = DecisionOps.qTukeyHsd(spark, sf).collect()
    val types = rows.map(r => Set(r.getString(0), r.getString(1)))
      .flatten.toSet
    val k = types.size
    assert(rows.length == k * (k - 1) / 2, "all pairwise comparisons")
    val crit = DecisionOps.tukeyQCrit05(k)
    rows.foreach { r =>
      val q = r.getAs[Double]("q_stat")
      assert(r.getAs[Boolean]("significant") == (q > crit))
    }
  }

  test("meta analysis: i2 bounded, df = k-1, z = pooled/se") {
    val row = DecisionOps.qMetaAnalysis(spark, sf).collect().head
    val i2 = row.getAs[Double]("i2")
    assert(i2 >= 0.0 && i2 < 1.0)
    assert(row.getAs[Long]("df") == row.getAs[Long]("k") - 1)
    val z = row.getAs[Double]("pooled_effect") / row.getAs[Double]("se")
    assert(math.abs(z - row.getAs[Double]("z")) < 1e-3)
  }

  test("best of n: n=1 reproduces the source mean, and exp_max is " +
      "non-decreasing in n, bounded by the source max") {
    val rows = DecisionOps.qBestOfN(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getAs[Double]("exp_max")))
    val bySource = rows.groupBy(_._1)
    val stats = Tables.df(spark, sf, "documents")
      .select($"source", TextFunctions.qualityScore($"text").as("v"))
      .groupBy($"source")
      .agg(avg($"v").as("mean"), max($"v").as("mx"))
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    bySource.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 4, 8, 16))
      val (mean, mx) = stats(src)
      assert(math.abs(sorted.head._3 - mean) < 1e-4,
        s"$src: E[max of 1] must be the mean")
      assert(sorted.map(_._3).sliding(2).forall(p => p(1) >= p(0) - 1e-9),
        s"$src: expected max must be monotone in n")
      assert(sorted.last._3 <= mx + 1e-9,
        s"$src: expected max cannot exceed the source max")
    }
  }
}
