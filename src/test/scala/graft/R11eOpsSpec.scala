package graft

import graft.queries.{CurateOps, InferOps, SketchOps}

/** Round-11 fifth batch: McNemar replay, Levene bounds, histogram
  * selectivity accuracy, zone-map soundness + the clustering payoff,
  * and the winnowing guarantee surfacing as top-band recall. */
class R11eOpsSpec extends SparkSpec {

  test("mcnemar: chi2 replays from the discordant cells") {
    val r = InferOps.qMcnemar(spark, sf).collect().head
    val b = r.getAs[Long]("b"); val c = r.getAs[Long]("c")
    if (b + c > 0) {
      val chi = (math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) / (b + c)
      assert(math.abs(r.getAs[Double]("chi2") - chi) < 1e-5)
      assert(r.getAs[Boolean]("significant") == (chi > 3.84))
    }
    assert(r.getAs[Long]("n_a_correct") <= r.getAs[Long]("n"))
  }

  test("levene: W non-negative and df bookkeeping consistent") {
    val r = InferOps.qLevene(spark, sf).collect().head
    assert(r.getAs[Long]("k") == 5)
    val w = r.getAs[Double]("w_stat")
    assert(!w.isNaN && w >= 0.0)
    assert(r.getAs[Boolean]("heteroscedastic") == (w > 2.37))
  }

  test("selectivity: uniform-ish fixture estimates land within 10% of " +
      "actual for all three predicates") {
    SketchOps.qSelectivityEst(spark, sf).collect().foreach { r =>
      val ratio = r.getAs[Double]("ratio")
      assert(ratio > 0.9 && ratio < 1.1,
        s"${r.getString(0)} ratio $ratio")
    }
  }

  test("zonemap: skipping is sound on both layouts and clustering " +
      "strictly improves the skip rate") {
    val rows = SketchOps.qZonemapPrune(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.values.foreach { r =>
      assert(r.getAs[Long]("matches_missed") == 0L,
        "zone-map pruning must never lose a matching row")
      assert(r.getAs[Long]("n_zones") == 32L)
    }
    val arrival = rows("arrival_order").getAs[Double]("frac_rows_skipped")
    val clustered =
      rows("clustered_by_price").getAs[Double]("frac_rows_skipped")
    assert(clustered > arrival,
      s"clustered layout ($clustered) must out-skip arrival ($arrival)")
    assert(clustered > 0.5, "clustering by the predicate column should " +
      s"prune most zones, got $clustered")
  }

  test("winnow eval: recall 1.0 in the top containment band (the " +
      "winnowing long-run guarantee)") {
    val rows = CurateOps.qWinnowEval(spark, sf).collect()
    assert(rows.nonEmpty, "the fixture must contain containment pairs")
    val top = rows.maxBy(_.getAs[Int]("band"))
    assert(top.getAs[Double]("recall") == 1.0,
      s"band ${top.getAs[Int]("band")} recall ${top.getAs[Double]("recall")}")
  }
}
