package graft

import graft.queries.{CorpusOps, InferOps, LearnOps}
import org.apache.spark.sql.functions._

/** Round-11 second batch: formula replays (readability, kappa, ridge)
  * and an independent AUC computation against the rank-sum identity. */
class R11bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("readability: both scores replay from the row's own counts") {
    val rows = CorpusOps.qReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("words").toDouble
      val s = math.max(r.getAs[Long]("sentences"), 1L).toDouble
      val y = r.getAs[Long]("syllables").toDouble
      val fre = 206.835 - 1.015 * (w / s) - 84.6 * (y / math.max(w, 1.0))
      val fk = 0.39 * (w / s) + 11.8 * (y / math.max(w, 1.0)) - 15.59
      assert(math.abs(r.getAs[Double]("flesch_ease") - fre) < 1e-3)
      assert(math.abs(r.getAs[Double]("fk_grade") - fk) < 1e-3)
      assert(y >= w * 0.5, "every word should carry >= ~1 vowel group")
    }
  }

  test("kappa: replays from its own contingency cells and is <= p_o") {
    val r = InferOps.qKappa(spark, sf).collect().head
    val Seq(n11, n10, n01, n00) =
      Seq("n11", "n10", "n01", "n00").map(r.getAs[Long](_).toDouble)
    val n = n11 + n10 + n01 + n00
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) +
      ((n01 + n00) / n) * ((n10 + n00) / n)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-5)
    assert(kappa <= po + 1e-12, "chance correction can only lower agreement")
  }

  test("ridge: coefficients satisfy the regularized normal equations") {
    val r = LearnOps.qRidge(spark, sf).collect().head
    // reassemble the centered system from raw data and check residuals
    val per = Tables.df(spark, sf, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("x1"),
        sum($"l_quantity".cast("long")).as("x2"))
      .join(Tables.df(spark, sf, "orders")
        .select($"o_orderkey".as("l_orderkey"),
          $"o_totalprice".as("t")), "l_orderkey")
      .select($"x1".cast("double"), $"x2".cast("double"),
        round($"t", 2).as("t"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
    val n = per.length.toDouble
    val mx = per.map(_._1).sum / n; val my = per.map(_._2).sum / n
    val mt = per.map(_._3).sum / n
    val cxx = per.map(p => (p._1 - mx) * (p._1 - mx)).sum + 10.0
    val cyy = per.map(p => (p._2 - my) * (p._2 - my)).sum + 10.0
    val cxy = per.map(p => (p._1 - mx) * (p._2 - my)).sum
    val cxt = per.map(p => (p._1 - mx) * (p._3 - mt)).sum
    val cyt = per.map(p => (p._2 - my) * (p._3 - mt)).sum
    val w1 = r.getAs[Double]("w_lines"); val w2 = r.getAs[Double]("w_qty")
    // normal equations: (cxx)w1 + (cxy)w2 = cxt ; (cxy)w1 + (cyy)w2 = cyt
    assert(math.abs(cxx * w1 + cxy * w2 - cxt) / math.abs(cxt) < 1e-3,
      "first normal equation")
    assert(math.abs(cxy * w1 + cyy * w2 - cyt) / math.abs(cyt) < 1e-3,
      "second normal equation")
  }

  test("auc: matches an independent average-rank computation") {
    val r = LearnOps.qAuc(spark, sf).collect().head
    val scored = Tables.df(spark, sf, "events")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_ev"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .select($"y", round(lit(1.0)
        / (lit(1.0) + exp((lit(3.0) - $"n_ev") / lit(2.0))), 6).as("p"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val sorted = scored.sortBy(_._2)
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      ranks(sorted(i)._2) = avg
      i = j
    }
    val nPos = scored.count(_._1 == 1L).toDouble
    val nNeg = scored.length - nPos
    val rPos = scored.filter(_._1 == 1L).map(x => ranks(x._2)).sum
    val auc = (rPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
    assert(math.abs(r.getAs[Double]("auc") - auc) < 1e-5,
      s"registered ${r.getAs[Double]("auc")} vs direct $auc")
  }

  test("logreg: converged weights are finite and deterministic") {
    val a = LearnOps.qLogreg(spark, sf).collect().head
    val b = LearnOps.qLogreg(spark, sf).collect().head
    assert(a == b, "two runs must produce identical weights")
    Seq("w_bias", "w_ntok", "w_stop").foreach { c =>
      val v = a.getAs[Double](c)
      assert(!v.isNaN && math.abs(v) < 10.0, s"$c = $v")
    }
    val acc = a.getAs[Double]("train_acc")
    assert(acc > 0.0 && acc <= 1.0)
  }
}
