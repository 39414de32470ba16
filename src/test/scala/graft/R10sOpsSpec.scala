package graft

import graft.queries.{CorpusOps, EventOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10s operators: G² collocations replayed
  * against a brute-force contingency computation, and the LTV
  * composite's consistency with its two oracled ingredients. */
class R10sOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_llr_colloc ------------------------------------------------------

  test("llr collocations: G2 non-negative descending, support floor " +
      "holds, top entry matches a brute-force 2x2 computation") {
    val rows = CorpusOps.qLlrColloc(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._3 >= 5))
    assert(rows.forall(_._4 >= -1e-6))
    val g = rows.map(_._4)
    assert(g.sliding(2).forall(p => p.head >= p.last))
    // brute-force the winner's 2x2 table
    val (a, b, k11, g2) = rows.head
    val bigrams = Tables.df(spark, sf, "documents")
      .select($"doc_id",
        posexplode(graft.functions.TextFunctions.tokens($"text"))
          .as(Seq("pos", "t")))
      .withColumn("u", lead($"t", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"pos")))
      .filter($"u".isNotNull)
      .select($"t".as[String], $"u".as[String]).collect()
    val n = bigrams.length.toDouble
    val kk11 = bigrams.count(p => p._1 == a && p._2 == b).toDouble
    val r1 = bigrams.count(_._1 == a).toDouble
    val c1 = bigrams.count(_._2 == b).toDouble
    assert(kk11 == k11)
    def t(k: Double, r: Double, c: Double): Double =
      if (k > 0) k * math.log(k * n / (r * c)) else 0.0
    val want = 2.0 * (t(kk11, r1, c1) + t(r1 - kk11, r1, n - c1)
      + t(c1 - kk11, n - r1, c1)
      + t(n - r1 - c1 + kk11, n - r1, n - c1))
    assert(math.abs(g2 - want) < 1e-3, s"($a,$b): $g2 vs $want")
  }

  // ---- q_ltv -------------------------------------------------------------

  test("ltv: components reconcile with the K-M curve and the purchase " +
      "stream, product identity holds") {
    val r = EventOps.qLtv(spark, sf)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    val (nSteps, expDays, userDays, totalRev, revPerUd, ltv) = r
    val curve = EventOps.qSurvival(spark, sf)
      .select($"survival").as[Double].collect()
    assert(nSteps == curve.length)
    assert(math.abs(expDays - curve.sum) < 1e-4,
      "expected active days = sum of the oracled survival curve")
    val wantRev = Tables.df(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .agg(sum($"value".cast("decimal(18,2)")).cast("double"))
      .as[Double].head()
    assert(math.abs(totalRev - wantRev) < 0.01)
    assert(math.abs(revPerUd - wantRev / userDays) < 1e-4)
    assert(math.abs(ltv - BigDecimal(expDays * revPerUd).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
  }
}
