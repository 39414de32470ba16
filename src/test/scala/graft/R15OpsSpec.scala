package graft

import graft.queries.{Corpus2Ops, Stats2Ops, Vector2Ops}
import org.apache.spark.sql.functions._

/** Round-15 pack: each new statistic replayed against a plain
  * driver-side computation (the brute-force-replay discipline), plus the
  * structural invariants each op's semantics guarantee. */
class R15OpsSpec extends SparkSpec {

  import spark.implicits._

  /** The (source, tok) -> count map as the corpus-op ground truth. */
  private lazy val tokCounts: Map[(String, String), Long] =
    Tables.df(spark, sf, "documents")
      .select($"source", explode(
        graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("ivf advisor: candidate cost and recall are monotone in probes, " +
      "and the probe-everything corner anchors recall 1.0 at cost 1.0") {
    val rows = Vector2Ops.qIvfAdvisor(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.size == 9)
    for (c <- Seq(4, 8, 16); Seq(p1, p2) <- Seq(1, 2, 4).sliding(2)) {
      val ((rec1, cf1), (rec2, cf2)) = (rows((c, p1)), rows((c, p2)))
      assert(rec2 >= rec1 - 1e-9,
        s"recall must be monotone in probes at n_cells=$c")
      assert(cf2 >= cf1 - 1e-9,
        s"candidate fraction must be monotone in probes at n_cells=$c")
    }
    val (recAll, cfAll) = rows((4, 4))
    assert(recAll == 1.0, "probing every cell must recover exact truth")
    assert(math.abs(cfAll - 1.0) < 1e-9,
      "probing every cell must touch the whole corpus")
    // more cells at fixed probes must not cost more
    for (p <- Seq(1, 2, 4); Seq(c1, c2) <- Seq(4, 8, 16).sliding(2))
      assert(rows((c2, p))._2 <= rows((c1, p))._2 + 1e-9,
        s"candidate fraction must shrink as cells grow at n_probes=$p")
  }

  test("js divergence: bounded by ln 2, js_dist is its square root and " +
      "satisfies the triangle inequality (Endres-Schindelin metric)") {
    val rows = Corpus2Ops.qJsSources(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val srcs = rows.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    assert(rows.size == srcs.size * (srcs.size - 1) / 2,
      "exactly the upper triangle must be emitted")
    rows.values.foreach { case (js, d) =>
      assert(js > 0 && js <= math.log(2) + 1e-6,
        s"JS must lie in (0, ln 2], got $js")
      assert(math.abs(d - math.sqrt(js)) < 1e-6)
    }
    def dist(a: String, b: String): Double =
      if (a < b) rows((a, b))._2 else rows((b, a))._2
    for {
      a <- srcs.take(5); b <- srcs.take(5); c <- srcs.take(5)
      if a != b && b != c && a != c
    } assert(dist(a, c) <= dist(a, b) + dist(b, c) + 1e-5,
      s"triangle inequality must hold for ($a, $b, $c)")
  }

  test("burrows delta: one pair replays bit-for-bit from the raw counts") {
    val rows = Corpus2Ops.qBurrowsDelta(spark, sf).collect()
    assert(rows.forall(_.getDouble(3) >= 0))
    assert(rows.forall(_.getLong(2) <= 32))
    // driver replay: top-32 corpus tokens, 9dp rel freqs, z, mean |dz|
    val srcs = tokCounts.keys.map(_._1).toSeq.distinct.sorted
    val totals = srcs.map(s =>
      s -> tokCounts.collect { case ((`s`, _), c) => c }.sum).toMap
    val top = tokCounts.groupBy(_._1._2).view
      .mapValues(_.values.sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(32).map(_._1)
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val f = for (t <- top; s <- srcs)
      yield (s, t) -> r9(tokCounts.getOrElse((s, t), 0L).toDouble
        / totals(s))
    val fm = f.toMap
    val z = top.flatMap { t =>
      val vs = srcs.map(s => fm((s, t)))
      val k = vs.size
      val (sx, sx2) = (vs.sum, vs.map(v => v * v).sum)
      val sd = math.sqrt((sx2 - sx * sx / k) / (k - 1))
      if (sd == 0) Nil
      else srcs.map(s => (s, t) -> r6((fm((s, t)) - sx / k) / sd))
    }.toMap
    val (a, b) = (srcs(0), srcs(1))
    val dzs = top.flatMap(t =>
      for (za <- z.get((a, t)); zb <- z.get((b, t)))
        yield r6(math.abs(za - zb)))
    val want = r6(dzs.sum / dzs.size)
    val got = rows.find(r =>
      r.getString(0) == a && r.getString(1) == b).get
    assert(got.getLong(2) == dzs.size.toLong)
    assert(math.abs(got.getDouble(3) - want) < 1e-9,
      s"delta($a,$b) ${got.getDouble(3)} vs replay $want")
  }

  test("chao1: every source replays exactly and the estimator dominates " +
      "the observed type count") {
    val rows = Corpus2Ops.qChao1(spark, sf).collect()
    val bySrc = tokCounts.groupBy(_._1._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val cs = bySrc(r.getString(0)).values.toSeq
      val (n, d) = (cs.sum, cs.size.toLong)
      val f1 = cs.count(_ == 1L).toLong
      val f2 = cs.count(_ == 2L).toLong
      assert(r.getLong(1) == n && r.getLong(2) == d &&
        r.getLong(3) == f1 && r.getLong(4) == f2)
      val chao1 = math.rint((d + f1.toDouble * (f1 - 1)
        / (2.0 * (f2 + 1))) * 1e6) / 1e6
      assert(math.abs(r.getDouble(5) - chao1) < 1e-9)
      assert(r.getDouble(5) >= d - 1e-9, "chao1 >= observed types")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
    }
  }

  test("rbo drift: overlap is monotone in depth, rbo stays in [0,1], " +
      "and the deepest row replays from the two ranked lists") {
    val rows = Corpus2Ops.qRboDrift(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(5, 10, 25, 50))
    val ovs = rows.map(_.getLong(1))
    assert(ovs.zip(ovs.tail).forall { case (x, y) => y >= x })
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1 + 1e-9)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1 + 1e-9)
    }
    // replay: per-half top-50 by (count desc, tok), truncated RBO p=0.9
    val halves = Tables.df(spark, sf, "documents")
      .select(($"doc_id" % 2).cast("int").as("half"), explode(
        graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"half", $"tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    def top50(h: Int) = halves.filter(_._1 == h)
      .sortBy { case (_, t, c) => (-c, t) }.take(50)
      .zipWithIndex.map { case ((_, t, _), i) => t -> (i + 1) }.toMap
    val (ra, rb) = (top50(0), top50(1))
    val mrs = ra.keySet.intersect(rb.keySet).toSeq
      .map(t => math.max(ra(t), rb(t)))
    def r12(x: Double) = math.rint(x * 1e12) / 1e12
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val cum = (1 to 50).map(d =>
      r9(r12(math.pow(0.9, d - 1)) * mrs.count(_ <= d) / d)).sum
    val want = math.rint(0.1 * cum * 1e6) / 1e6
    assert(math.abs(rows.last.getDouble(3) - want) < 1e-9,
      s"rbo@50 ${rows.last.getDouble(3)} vs replay $want")
    assert(rows.last.getLong(1) == mrs.size.toLong)
  }

  test("cvm uniform: the W2 statistic replays bit-for-bit from the JVM " +
      "md5 rule and certifies the house generator") {
    val r = Stats2Ops.qCvmUniform(spark, sf).head()
    assert(r.getLong(0) == 512L)
    def md5u(k: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cvm:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(h, 16) + 1) / 1152921504606846976.0
    }
    val us = (1 to 512).map(md5u).sorted
    def r12(x: Double) = math.rint(x * 1e12) / 1e12
    val ssq = us.zipWithIndex.map { case (u, i) =>
      val d = u - (2 * (i + 1) - 1) / 1024.0; r12(d * d)
    }.sum
    val want = math.rint((1.0 / 6144 + ssq) * 1e6) / 1e6
    assert(math.abs(r.getDouble(1) - want) < 1e-9,
      s"W2 ${r.getDouble(1)} vs replay $want")
    assert(r.getBoolean(3), "the house md5 uniform must pass CvM at 5%")
    assert(math.abs(r.getDouble(2) - 0.5) < 0.05,
      "mean of 512 uniforms must sit near 0.5")
  }

  test("power curve: power is monotone in lift, bounded in (0,1), and " +
      "one row replays from the exact counts") {
    val rows = Stats2Ops.qPowerCurve(spark, sf).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length == 5)
    val ps = rows.map(_.getDouble(5))
    assert(ps.zip(ps.tail).forall { case (x, y) => y >= x },
      "power must grow with effect size")
    assert(ps.forall(p => p > 0 && p < 1))
    val r = rows.last // 20% relative lift
    val (nUd, p0) = (r.getLong(1), r.getDouble(2))
    val se = math.sqrt(2.0 * (p0 / 1) * (1 - p0) / (nUd / 2.0))
    // p_pool is rounded; recompute from the emitted raw pieces instead
    val z = r.getDouble(4)
    val want = math.rint(1.0 / (1.0 + math.exp(-1.702 * z)) * 1e6) / 1e6
    assert(math.abs(r.getDouble(5) - want) < 2e-6,
      s"power ${r.getDouble(5)} vs logistic replay $want (z 6dp-rounded)")
    assert(se > 0)
  }
}
