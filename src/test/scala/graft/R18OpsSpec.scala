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

  test("q_bpe_train: a sequential leftmost-greedy replay reproduces " +
      "every round's merge pick, pair count, and post-merge symbol " +
      "total (the relational run-parity apply IS the left-to-right scan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Corpus2Ops.qBpeTrain(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length === 6)
    val toks = Tables.df(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text"))
        .as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] =
      toks.map { case (t, c) => (t.map(_.toString).toArray, c) }
    def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += s(i); i += 1 }
      }
      buf.toArray
    }
    rows.foreach { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val ((a, b), n) = pc.toSeq
        .sortBy { case ((x, y), m) => (-m, x, y) }.head
      assert(r.getAs[String]("sym_a") === a
        && r.getAs[String]("sym_b") === b,
        s"round ${r.getAs[Int]("round")}: replay picked ($a,$b), " +
          s"query picked (${r.getAs[String]("sym_a")}," +
          s"${r.getAs[String]("sym_b")})")
      assert(r.getAs[Long]("pair_count") === n)
      vocab = vocab.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      val symsTotal = vocab.map { case (s, c) => s.length * c }.sum
      assert(r.getAs[Long]("corpus_symbols") === symsTotal,
        s"round ${r.getAs[Int]("round")}: post-merge symbol totals differ")
    }
    // the trajectory is monotone: every merge strictly shrinks the corpus
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(y.getAs[Long]("corpus_symbols") < x.getAs[Long]("corpus_symbols"))
    }
  }
}
