package graft

import graft.queries.{Analytics, TextOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Properties of the round-10m active-learning/feature-engineering
  * operators: uncertainty sampling's margin laws, cross-validation's
  * accounting and fold agreement with q_kfold's coin, and target
  * encoding's leakage-freedom (a row's own label never enters its
  * feature). */
class R10mOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_uncertainty -----------------------------------------------------

  test("uncertainty: margins non-negative ascending, margin consistent " +
      "with the two top scores, zero-margin docs are genuinely tied") {
    val rows = TextOps.qUncertainty(spark, sf)
      .as[(Long, String, String, Int, Int, Int)].collect()
    assert(rows.length == 20)
    rows.foreach { case (_, _, _, margin, top1, top2) =>
      assert(top1 >= top2 && margin == top1 - top2)
      assert(margin >= 0)
    }
    val m = rows.map(_._4)
    assert(m.sliding(2).forall(p => p.head <= p.last),
      "top-20 must be least-confident first")
  }

  // ---- q_cv_metric -------------------------------------------------------

  test("cv metric: folds conserve docs, accuracy identities hold, and " +
      "the cross-fold moments match the 5 fold accuracies") {
    val rows = TextOps.qCvMetric(spark, sf)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._2).sum == Tables.df(spark, sf, "documents").count())
    rows.foreach { case (fold, n, nc, acc, _, _) =>
      assert(fold >= 0 && fold <= 4 && nc <= n)
      assert(math.abs(acc - nc.toDouble / n) < 1e-5)
    }
    val accs = rows.map(_._4)
    val mean = accs.sum / 5
    val std = math.sqrt(accs.map(a => (a - mean) * (a - mean)).sum / 4)
    assert(math.abs(rows.head._5 - mean) < 1e-4)
    assert(math.abs(rows.head._6 - std) < 1e-3)
  }

  // ---- q_target_enc ------------------------------------------------------

  test("target encoding: leakage-free — removing a row's own label " +
      "changes the group feature; shrinkage bounded by group/prior") {
    val rows = Analytics.qTargetEnc(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 100)
    val mu = rows.head._5
    // recompute group stats directly
    val grp = Tables.df(spark, sf, "customer")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("s"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (_, nation, bal, enc, muR) =>
      assert(muR == mu, "one global prior")
      val (n, s) = grp(nation)
      val want = ((s - bal) + 10.0 * mu) / ((n - 1) + 10.0)
      assert(math.abs(enc - want) < 1e-4,
        s"nation $nation: enc $enc vs manual $want")
      // leakage check: the encoding differs from the naive group mean
      // that WOULD include the row (unless identical by chance)
      val naive = s / n
      assert(math.abs(enc - naive) > 1e-9 || math.abs(bal - naive) < 1e-6)
    }
  }
}
