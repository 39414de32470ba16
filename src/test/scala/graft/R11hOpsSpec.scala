package graft

import graft.queries.{GovernOps, TextOps}

/** Round-11 eighth batch: t-closeness EMD bounds and the quality-sweep
  * monotonicity laws. */
class R11hOpsSpec extends SparkSpec {

  test("t-closeness: t in [0,1], violations replay, and small classes " +
      "dominate the violators") {
    val rows = GovernOps.qTcloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("t")
      assert(t >= 0.0 && t <= 1.0, s"EMD t $t out of range")
      assert(r.getAs[Boolean]("violates_t02") == (t > 0.2))
    }
    val (viol, ok) = rows.partition(_.getAs[Boolean]("violates_t02"))
    if (viol.nonEmpty && ok.nonEmpty) {
      def meanN(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Long]("n_rows")).sum.toDouble / rs.length
      assert(meanN(viol) < meanN(ok),
        "skewed-distribution classes should skew small (sampling noise)")
    }
  }

  test("quality sweep: raising the cut keeps fewer docs with higher " +
      "mean score; fractions are consistent") {
    val rows = TextOps.qQualitySweep(spark, sf).collect()
      .sortBy(_.getAs[Double]("thr"))
    assert(rows.length == 3)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("docs_kept") >= hi.getAs[Long]("docs_kept"),
        "docs kept must fall as the threshold rises")
      // mean_score_kept is NULL when a cut keeps zero docs — only
      // compare survivor quality between populated cuts
      if (lo.getAs[Long]("docs_kept") > 0 && hi.getAs[Long]("docs_kept") > 0)
        assert(lo.getAs[Double]("mean_score_kept") <=
          hi.getAs[Double]("mean_score_kept") + 1e-9,
          "survivor quality must not fall as the threshold rises")
    }
    rows.foreach { r =>
      val fd = r.getAs[Double]("frac_docs")
      val ft = r.getAs[Double]("frac_tokens")
      assert(fd >= 0.0 && fd <= 1.0 && ft >= 0.0 && ft <= 1.0)
    }
  }
}
