package graft

import graft.queries.{Analytics, CorpusOps, EventOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Properties of the round-10i operators: Wilson's bound dominated by
  * the raw rate and replayed in closed form, U-shaped attribution's
  * value-conservation law, and Kneser–Ney's defining property — the
  * smoothed conditional distribution sums to exactly 1 over the
  * vocabulary for every context. */
class R10iOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_wilson ----------------------------------------------------------

  test("wilson: bound below the rate, in [0,1), and equal to the closed " +
      "form") {
    val rows = Analytics.qWilson(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, n, r, rate, lower) =>
      assert(n >= 10 && r <= n)
      assert(lower >= 0.0 && lower < 1.0)
      assert(lower <= rate + 1e-9, "the lower bound cannot exceed p-hat")
      val ph = r.toDouble / n
      val want = (ph + 1.9208 / n - 1.96 * math.sqrt(
        (ph * (1 - ph) + 0.9604 / n) / n)) / (1.0 + 3.8416 / n)
      assert(math.abs(lower - want) < 1e-5)
    }
    val keys = rows.map(x => (-x._5, x._1)).toSeq
    assert(keys == keys.sorted)
  }

  // ---- q_attribution_u ---------------------------------------------------

  test("u-shaped attribution: credited value conserves total purchase " +
      "value across channels plus the 'none' bucket") {
    val rows = EventOps.qAttributionU(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("view", "click", "none")))
    val totalCredited = rows.map(_._3).sum
    val totalPurchases = Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .agg(sum($"value".cast("decimal(18,2)")).cast("double"))
      .as[Double].head()
    // per-purchase credits sum to exactly 1, so totals match up to the
    // per-touch rounding (9dp credit, 6dp money, thousands of terms)
    assert(math.abs(totalCredited - totalPurchases) < 0.05,
      s"credited $totalCredited vs purchases $totalPurchases")
    assert(rows.filter(_._1 != "none").forall(_._3 > 0.0))
  }

  // ---- q_kneser_ney ------------------------------------------------------

  test("kneser-ney: P(.|u) sums to exactly 1 over the vocabulary for " +
      "every context, and reported perplexities are coherent") {
    val rows = CorpusOps.qKneserNey(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nBg, nll, ppl) =>
      assert(nBg > 0 && nll > 0.0)
      assert(math.abs(ppl - math.exp(nll)) < 1e-4)
      assert(ppl >= 1.0)
    }
    // the defining KN property, checked densely on the tiny fixture vocab
    val bigrams = Tables.df(spark, sf, "documents")
      .select($"doc_id",
        posexplode(TextFunctions.tokens($"text")).as(Seq("pos", "u")))
      .withColumn("w2", lead($"u", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"pos")))
      .filter($"w2".isNotNull)
      .groupBy($"u", $"w2").count()
      .as[(String, String, Long)].collect()
    val vocab = (bigrams.map(_._1) ++ bigrams.map(_._2)).distinct
    val cb = bigrams.map(b => (b._1, b._2) -> b._3).toMap
    val cu = bigrams.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n1u = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val n1w = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val nTypes = bigrams.size.toDouble
    val d = 0.75
    cu.keys.take(10).foreach { u =>
      val s = vocab.map { w =>
        (math.max(cb.getOrElse((u, w), 0L).toDouble - d, 0.0)
          + d * n1u(u) * (n1w.getOrElse(w, 0) / nTypes)) / cu(u)
      }.sum
      assert(math.abs(s - 1.0) < 1e-9,
        s"sum_w P(w|$u) = $s, must be exactly 1")
    }
  }
}
