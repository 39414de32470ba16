package graft

import graft.queries.{EventOps, LearnOps, SourceOps}
import org.apache.spark.sql.functions._

/** Batch-4 round-17 contracts: Cox score-test identities, the
  * signal-free scorer's KS direction with a brute-force replay, and
  * compaction-plan accounting. */
class R17dOpsSpec extends SparkSpec {

  test("q_cox_score: fully-observed sample, HR replays exp(beta), " +
      "chi2 = U^2/I and significance agrees") {
    val r = EventOps.qCoxScore(spark, sf).collect().head
    assert(r.getAs[Long]("n_users") === r.getAs[Long]("n_events"),
      "every fixture user purchases — complete data by construction")
    assert(r.getAs[Double]("info_i") >= 0)
    (Option(r.getAs[java.lang.Double]("beta")),
      Option(r.getAs[java.lang.Double]("hazard_ratio")),
      Option(r.getAs[java.lang.Double]("score_chi2"))) match {
      case (Some(b), Some(h), Some(c)) =>
        assert(math.abs(h - math.exp(b)) < 1e-4, s"hr $h vs exp($b)")
        assert(c >= -1e-9)
        assert(r.getAs[Boolean]("sig_05") === (c > 3.841))
      case (None, None, None) => ()
      case other => fail(s"beta/hr/chi2 nullability must agree: $other")
    }
  }

  test("q_score_ks: the deliberately signal-free scorer posts a LOW " +
      "separation, and the statistic replays a brute-force scan") {
    import spark.implicits._
    val r = LearnOps.qScoreKs(spark, sf).collect().head
    val ks = r.getAs[Double]("ks")
    assert(ks >= 0 && ks <= 1.0 + 1e-9)
    assert(ks < 0.3,
      s"the marker scorer carries no real signal — KS $ks reading high " +
        "means the class conditionals got mixed up")
    // brute-force replay over collected (p, y)
    val py = LearnOps.scoredDocs(spark, sf)
      .select($"p", $"y").as[(Double, Long)].collect().sortBy(_._1)
    val t1 = py.count(_._2 == 1L).toDouble
    val t0 = py.length - t1
    var c1 = 0.0; var c0 = 0.0; var best = 0.0
    py.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      c1 += rows.count(_._2 == 1L); c0 += rows.count(_._2 == 0L)
      best = math.max(best, math.abs(c1 / t1 - c0 / t0))
    }
    assert(math.abs(ks - best) < 1e-6, s"ks $ks vs replay $best")
  }

  test("q_compaction_plan: files are fully accounted, bins never exceed " +
      "files, totals replay the corpus, fill/merge ratios consistent") {
    import spark.implicits._
    val rows = SourceOps.qCompactionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val docBytes = Tables.df(spark, sf, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val (nDocs, bytes) = docBytes(s)
      assert(r.getAs[Long]("n_files") === nDocs)
      assert(r.getAs[Long]("total_bytes") === bytes)
      val nBins = r.getAs[Long]("n_bins")
      assert(nBins >= 1 && nBins <= nDocs)
      assert(r.getAs[Double]("merge_factor") >= 1.0 - 1e-9)
      assert(r.getAs[Double]("mean_fill") > 0)
      assert(r.getAs[Long]("straggler_bins") <= nBins)
    }
  }
}
