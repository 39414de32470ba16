package graft

import graft.queries.{ServeOps, VectorQueries}

/** Round-18 op contracts. */
class R18OpsSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_semcache_lsh: the bucket-keyed cache is a strict SUBSET of the " +
      "exact cache — hits_lsh ≤ hits_exact at every τ, miss_delta ≥ 0, " +
      "rates consistent with their integer counts") {
    val rows = ServeOps.qSemcacheLsh(spark, sf).collect()
    assert(rows.length === 4, "one row per τ")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_queries")
      val he = r.getAs[Long]("hits_exact")
      val hl = r.getAs[Long]("hits_lsh")
      // an LSH candidate pair is an exact pair (same cosine, fewer
      // candidates), so the bucket-keyed decision can only MISS hits
      assert(hl <= he, s"tau=${r.getAs[Double]("tau")}: lsh hits $hl " +
        s"exceed exact hits $he — the candidate set leaked")
      assert(he <= n && hl >= 0)
      assert(r.getAs[Double]("hit_rate_exact") === rnd(he.toDouble / n, 6))
      assert(r.getAs[Double]("hit_rate_lsh") === rnd(hl.toDouble / n, 6))
      assert(r.getAs[Double]("miss_delta") === rnd((he - hl).toDouble / n, 6))
      assert(r.getAs[Double]("miss_delta") >= -1e-12)
    }
    // monotone in τ on both arms: a stricter threshold never adds hits
    val byTau = rows.sortBy(_.getAs[Double]("tau"))
    byTau.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("hits_exact") <= a.getAs[Long]("hits_exact"))
      assert(b.getAs[Long]("hits_lsh") <= a.getAs[Long]("hits_lsh"))
    }
  }

  test("q_semcache_lsh: same τ grid and query count discipline as the " +
      "exact q_semcache sweep (the two reports price the same stream " +
      "shape at different query deciles)") {
    val lsh = ServeOps.qSemcacheLsh(spark, sf).collect()
    val exact = VectorQueries.qSemcache(spark, sf).collect()
    assert(lsh.map(_.getAs[Double]("tau")).toSeq ===
      exact.map(_.getAs[Double]("tau")).toSeq)
    // %50 stream ⊂ %25 stream: the LSH report reads a subsample
    assert(lsh.head.getAs[Long]("n_queries") <=
      exact.head.getAs[Long]("n_queries"))
  }
}
