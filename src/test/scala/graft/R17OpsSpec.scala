package graft

import graft.queries.CurateOps

/** Round-17 op contracts. */
class R17OpsSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_containment_dir: directional fractions are consistent with " +
      "their shared numerator and the size ordering; verdicts match " +
      "the 0.5 bar") {
    val rows = CurateOps.qContainmentDir(spark, sf).collect()
    assert(rows.nonEmpty, "the fixture's sources share SOME shingles")
    rows.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val ni = r.getAs[Long]("n_inter")
      val cab = r.getAs[Double]("c_a_in_b")
      val cba = r.getAs[Double]("c_b_in_a")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(ni <= math.min(na, nb))
      assert(cab === rnd(ni.toDouble / na, 6))
      assert(cba === rnd(ni.toDouble / nb, 6))
      assert(r.getAs[Double]("asym")
        === rnd(ni.toDouble / na - ni.toDouble / nb, 6))
      // one numerator, two denominators: the SMALLER set is always the
      // more-contained one — the invariant that makes the read directional
      if (na <= nb) assert(cab >= cba) else assert(cba >= cab)
      val expected =
        if (cab >= 0.5 && cba >= 0.5) "mutual"
        else if (cab >= 0.5) "a_in_b"
        else if (cba >= 0.5) "b_in_a"
        else "distinct"
      assert(r.getAs[String]("verdict") === expected)
    }
    // unordered pairs appear at most once
    val keys = rows.map(r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
    assert(keys.distinct.length === keys.length)
  }
}
