package graft

import graft.queries.{EventOps, SketchOps}

/** Round-11 seventh batch: log-rank bookkeeping laws and the HLL
  * set-algebra consistency bounds. */
class R11gOpsSpec extends SparkSpec {

  test("logrank: null holds on the parity pseudo-treatment and the " +
      "O/E bookkeeping is coherent") {
    val r = EventOps.qLogrank(spark, sf).collect().head
    val o1 = r.getAs[Long]("observed_1")
    val e1 = r.getAs[Double]("expected_1")
    val v = r.getAs[Double]("variance")
    assert(r.getAs[Long]("n_times") > 0)
    assert(o1 >= 0 && e1 > 0 && v > 0)
    val z = r.getAs[Double]("z")
    assert(math.abs(z - (o1 - e1) / math.sqrt(v)) < 1e-3,
      "z replays from its own O/E/V")
    // parity is not a real treatment: the test must not fire
    assert(!r.getAs[Boolean]("significant"),
      s"pseudo-treatment must stay null, z = $z")
  }

  test("hll setops: union estimate from merged registers stays within " +
      "the sketch band and inclusion-exclusion is consistent") {
    val rows = SketchOps.qHllSetops(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("exact"), r.getAs[Double]("est"))).toMap
    assert(rows.keySet ==
      Set("a_even_orders", "b_odd_orders", "union", "intersection"))
    // standard error for m=256 is ~1.04/16 = 6.5%; allow 3 sigma
    Seq("a_even_orders", "b_odd_orders", "union").foreach { k =>
      val (exact, est) = rows(k)
      assert(math.abs(est - exact) / exact < 0.20, s"$k est $est vs $exact")
    }
    // inclusion-exclusion identity on the ESTIMATES themselves
    val i = rows("a_even_orders")._2 + rows("b_odd_orders")._2 -
      rows("union")._2
    assert(math.abs(i - rows("intersection")._2) < 1e-3,
      "intersection row must equal A + B - union of the estimates")
    // union can never estimate below either side (registers are maxes)
    assert(rows("union")._2 >= rows("a_even_orders")._2 - 1e-9)
    assert(rows("union")._2 >= rows("b_odd_orders")._2 - 1e-9)
  }
}
