package graft

import graft.queries.{Corpus2Ops, GovernOps, LearnOps, XModalOps}

/** Batch-6 round-17 contracts: media-entropy bounds, grouped-ECE
  * identities, prefix-cache accounting, DP top-k utility. */
class R17fOpsSpec extends SparkSpec {

  test("q_media_entropy: entropies sit in [0, ln 64], min ≤ mean ≤ max, " +
      "and the ASCII fixture's signatures are non-degenerate") {
    val rows = XModalOps.qMediaEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val ln64 = math.log(64.0)
    rows.foreach { r =>
      val (lo, mid, hi) = (r.getAs[Double]("min_entropy"),
        r.getAs[Double]("mean_entropy"), r.getAs[Double]("max_entropy"))
      assert(lo >= -1e-9 && hi <= ln64 + 1e-6,
        s"64-bin entropy is bounded by ln 64: [$lo, $hi]")
      assert(lo <= mid + 1e-9 && mid <= hi + 1e-9)
      assert(r.getAs[Long]("n_degenerate") <= r.getAs[Long]("n_docs"))
      assert(mid > 2.0,
        "position-salted ASCII histograms must not read degenerate")
    }
  }

  test("q_group_ece: ECE never exceeds the worst bin gap, population " +
      "covers the corpus") {
    val rows = LearnOps.qGroupEce(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.df(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val ece = r.getAs[Double]("ece")
      assert(ece >= 0 && ece <= 1.0 + 1e-9)
      assert(ece <= r.getAs[Double]("max_bin_gap") + 1e-9,
        "a weighted mean of gaps cannot exceed the max gap")
    }
  }

  test("q_prefix_cache: bucket accounting is exact and savings sit " +
      "inside [0, 1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Corpus2Ops.qPrefixCache(spark, sf).collect()
    assert(rows.nonEmpty)
    val docsPerSource = Tables.df(spark, sf, "documents")
      .groupBy($"source").agg(count(lit(1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") === docsPerSource(s))
      assert(r.getAs[Long]("n_prefixes") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("docs_shared") <= r.getAs[Long]("n_docs"))
      val sf_ = r.getAs[Double]("savings_frac")
      assert(sf_ >= 0 && sf_ < 1.0,
        "cached prefix tokens are a strict subset of all tokens")
    }
  }

  test("q_dp_topk: 20 released ranks in order, noisy scores " +
      "nonincreasing, and utility holds at unit-scale noise") {
    val rows = GovernOps.qDpTopk(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("released_rank")).toSeq == (1 to 20))
    val ns = rows.map(_.getAs[Double]("noisy"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a + 1e-9 })
    val overlap = rows.count(_.getAs[Boolean]("in_true_topk"))
    assert(overlap >= 15,
      s"count gaps dwarf unit Gumbel noise on this fixture — overlap " +
        s"$overlap/20 reading low means the scores got scrambled")
  }
}
