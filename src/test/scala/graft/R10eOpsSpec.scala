package graft

import graft.queries.{GovernOps, LearnOps}

/** Properties of the round-10e governance/calibration operators beyond
  * the DuckDB hash gate: l-diversity's information-theoretic bounds, the
  * reliability table's accounting identities (with the pinned fixture
  * reading: a no-signal scorer must show large ECE), and the relational
  * isotonic fit checked against a sequential pool-adjacent-violators
  * reference implementation. */
class R10eOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_ldiversity ------------------------------------------------------

  test("l-diversity: entropy bounds hold per class and rows are conserved") {
    val rows = GovernOps.qLdiversity(spark, sf)
      .as[(String, Long, Long, Long, Double, Double, Boolean, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, l, h, effL, div2, div3) =>
      assert(l >= 1 && l <= n)
      assert(h >= -1e-9, "entropy is non-negative")
      assert(h <= math.log(l.toDouble) + 1e-6,
        s"H <= ln(distinct_l): $h vs ln($l)")
      assert(effL >= 1.0 - 1e-6 && effL <= l + 1e-6,
        s"1 <= exp(H) <= distinct_l: $effL vs $l")
      assert(div2 == (l >= 2) && div3 == (l >= 3))
    }
    val total = Tables.df(spark, sf, "customer").count()
    assert(rows.map(_._3).sum == total,
      "every customer row lands in exactly one QI class")
  }

  // ---- q_calibration -----------------------------------------------------

  test("calibration: accounting identities hold and the no-signal " +
      "fixture scorer reads as badly calibrated (pinned)") {
    val rows = LearnOps.qCalibration(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val nTot = rows.map(_._2).sum
    assert(nTot == Tables.df(spark, sf, "documents").count())
    rows.foreach { case (bin, n, conf, acc, ece) =>
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean confidence $conf out of its decile")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(ece - math.abs(acc - conf) * n / nTot) < 1e-5)
    }
    // pinned: the marker count has no signal on the synthetic vocabulary,
    // so confidence spreads while accuracy stays flat — ECE must be large
    val eceTotal = rows.map(_._5).sum
    assert(eceTotal >= 0.1,
      s"fixture scorer must read miscalibrated, ECE $eceTotal — if this " +
        "fires the fixture gained a real language signal")
  }

  // ---- q_isotonic --------------------------------------------------------

  test("isotonic: monotone, mean-preserving, and equal to a sequential " +
      "PAVA reference") {
    val rows = LearnOps.qIsotonic(spark, sf)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val iso = rows.map(_._4)
    assert(iso.sliding(2).forall(p => p.head <= p.last + 1e-9),
      s"isotonic fit must be non-decreasing: ${iso.toSeq}")
    // projection preserves the weighted mean
    val wMeanRaw = rows.map(r => r._3 * r._2).sum / rows.map(_._2).sum
    val wMeanIso = rows.map(r => r._4 * r._2).sum / rows.map(_._2).sum
    assert(math.abs(wMeanRaw - wMeanIso) < 1e-3,
      s"PAVA preserves the overall mean: $wMeanRaw vs $wMeanIso")
    // sequential pool-adjacent-violators reference on the same bins
    case class Block(var w: Double, var sum: Double) {
      def mean: Double = sum / w
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
    rows.foreach { r =>
      blocks += ((Block(r._2.toDouble, r._3 * r._2), 1))
      while (blocks.length > 1 &&
          blocks(blocks.length - 2)._1.mean > blocks.last._1.mean) {
        val (b2, c2) = blocks.remove(blocks.length - 1)
        val (b1, c1) = blocks.remove(blocks.length - 1)
        blocks += ((Block(b1.w + b2.w, b1.sum + b2.sum), c1 + c2))
      }
    }
    val ref = blocks.flatMap { case (b, c) => Seq.fill(c)(b.mean) }
    rows.map(_._4).zip(ref).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-4,
        s"bin ${rows(i)._1}: relational fit $got vs sequential PAVA $want")
    }
  }
}
