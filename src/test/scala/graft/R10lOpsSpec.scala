package graft

import graft.queries.{LearnOps, StatsOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Properties of the round-10l resampling/preference operators: the
  * Poisson bootstrap's interval containing the point estimate with a
  * JVM replay of one replicate's weights, the jackknife's weighted
  * leave-out identity, and preference pairs' margin/extremeness laws. */
class R10lOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_bootstrap_ci ----------------------------------------------------

  test("bootstrap: CI brackets the estimate, se positive, and replicate " +
      "1's weights replay exactly in the JVM") {
    val r = StatsOps.qBootstrapCi(spark, sf)
      .as[(Long, Double, Long, Double, Double, Double, Double)].head()
    val (nUsers, est, nReps, bootMean, se, lo, hi) = r
    assert(nReps == 32)
    assert(lo <= hi)
    assert(est >= lo - 3 * se && est <= hi + 3 * se,
      s"estimate $est far outside [$lo, $hi] (se $se)")
    assert(se > 0.0 && math.abs(bootMean - est) < 5 * se)
    // replay replicate b=1: same md5 uniforms -> same Poisson weights
    val users = Tables.df(spark, sf, "events")
      .filter($"event_type".isin("view", "purchase"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
      .select($"user_id".as[Long],
        round($"p".cast("double") / $"n", 6).as[Double])
      .collect()
    assert(users.length == nUsers)
    val md = java.security.MessageDigest.getInstance("MD5")
    val cdf = Array(0.3678794412, 0.7357588823, 0.9196986029,
      0.9810118431, 0.9963401532, 0.9994058151)
    def weight(uid: Long): Long = {
      val hex = md.digest(s"boot:1:$uid".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) /
        1152921504606846976.0
      cdf.indexWhere(u <= _) match { case -1 => 6L; case i => i.toLong }
    }
    val (sw, swx) = users.foldLeft((0L, BigDecimal(0))) {
      case ((a, b), (uid, x)) =>
        val w = weight(uid)
        (a + w, b + BigDecimal(w * x).setScale(9,
          BigDecimal.RoundingMode.HALF_UP))
    }
    val mb1 = (swx / sw).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // recompute replicate 1 through the Spark path shape
    val sparkMb1 = Tables.df(spark, sf, "events")
      .filter($"event_type".isin("view", "purchase"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
      .select($"user_id", round($"p".cast("double") / $"n", 6).as("x"))
      .withColumn("u", (conv(substring(md5(concat(lit("boot:1:"),
        $"user_id".cast("string"))), 1, 15), 16, 10).cast("long") + 1)
        / lit(1152921504606846976.0))
      .withColumn("w", when($"u" <= 0.3678794412, 0L)
        .when($"u" <= 0.7357588823, 1L).when($"u" <= 0.9196986029, 2L)
        .when($"u" <= 0.9810118431, 3L).when($"u" <= 0.9963401532, 4L)
        .when($"u" <= 0.9994058151, 5L).otherwise(6L))
      .agg((sum(round($"w" * $"x", 9)
        .cast("decimal(18,9)")).cast("double") / sum($"w")).as("m"))
      .select(round($"m", 6)).as[Double].head()
    assert(math.abs(sparkMb1 - mb1) < 1e-9,
      s"replicate-1 mean: JVM $mb1 vs Spark $sparkMb1")
  }

  // ---- q_jackknife -------------------------------------------------------

  test("jackknife: weighted leave-out identity recovers the corpus " +
      "mean, se positive") {
    val rows = StatsOps.qJackknife(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.df(spark, sf, "documents")
      .agg(count(lit(1)), sum($"n_chars")).as[(Long, Long)].head()
    val (n, s) = docs
    val mean = s.toDouble / n
    rows.foreach { case (_, nS, loo, dev, se) =>
      assert(se > 0.0)
      // (n - n_s) * loo + n_s * (source mean) == total: check the
      // reconstruction of the total from the leave-out mean
      val sS = s - loo * (n - nS)
      assert(sS > 0 && sS < s)
    }
    // leave-out means must bracket the overall mean unless one source
    // dominates; with ~20 similar sources they straddle it
    assert(rows.map(_._3).min <= mean + 1e-6 &&
      rows.map(_._3).max >= mean - 1e-6)
    assert(rows.forall(r => math.abs(r._4) < 50.0),
      "no source should move the corpus mean wildly on this fixture")
  }

  // ---- q_pref_pairs ------------------------------------------------------

  test("pref pairs: chosen strictly above rejected, chosen are the " +
      "source's top quality docs") {
    val rows = LearnOps.qPrefPairs(spark, sf)
      .as[(String, Int, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rk, cid, rid, qc, qr, m) =>
      assert(rk >= 1 && rk <= 3)
      assert(cid != rid)
      assert(qc > qr && math.abs(m - BigDecimal(qc - qr).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // the rank-1 chosen doc per source is the argmax of the quality score
    val best = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"source",
        TextFunctions.qualityScore($"text").as("q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy($"q".desc, $"doc_id".asc)))
      .filter($"rk" === 1)
      .select($"source", $"doc_id").as[(String, Long)].collect().toMap
    rows.filter(_._2 == 1).foreach { r =>
      assert(best(r._1) == r._3,
        s"${r._1}: rank-1 chosen ${r._3} is not the quality argmax")
    }
  }
}
