package graft

import graft.queries.{EventOps, GovernOps}

/** Round-11 ninth batch: BH-vs-Holm ordering laws and the DiD null. */
class R11iOpsSpec extends SparkSpec {

  test("bh fdr: adjusted p monotone in rank, never below raw p, and " +
      "rejects at least everything Holm rejects") {
    val bh = GovernOps.qBhFdr(spark, sf).collect()
    assert(bh.nonEmpty)
    var prev = 0.0
    bh.sortBy(_.getAs[Int]("rk")).foreach { r =>
      val adj = r.getAs[Double]("adj_p")
      assert(adj >= r.getAs[Double]("p") - 1e-9, "BH cannot lower a p-value")
      assert(adj >= prev - 1e-9, "step-up adjustment is monotone")
      prev = adj
    }
    val holmRejects = GovernOps.qHolm(spark, sf).collect()
      .filter(_.getAs[Boolean]("reject"))
      .map(r => (r.getString(0), r.getString(1))).toSet
    val bhRejects = bh.filter(_.getAs[Boolean]("reject"))
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(holmRejects.subsetOf(bhRejects),
      "FWER control (Holm) is strictly more conservative than FDR (BH)")
  }

  test("did: estimate replays from the four cell means and the parity " +
      "pseudo-treatment stays null") {
    val r = EventOps.qDid(spark, sf).collect().head
    val did = r.getAs[Double]("did")
    val replay = (r.getAs[Double]("p_treat_post")
      - r.getAs[Double]("p_treat_pre")) -
      (r.getAs[Double]("p_ctrl_post") - r.getAs[Double]("p_ctrl_pre"))
    assert(math.abs(did - replay) < 1e-5, s"did $did vs replay $replay")
    assert(r.getAs[Long]("n00") > 0 && r.getAs[Long]("n11") > 0,
      "all four cells populated")
    assert(!r.getAs[Boolean]("significant"),
      s"parity pseudo-treatment must stay null, z = ${r.getAs[Double]("z")}")
  }
}
