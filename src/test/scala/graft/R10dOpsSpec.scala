package graft

import graft.queries.{CorpusOps, CurateOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Properties of the round-10d text-trust operators beyond the DuckDB
  * hash gate: containment's set axioms and the fixture's planted exact
  * duplicates, the watermark detector's null-hypothesis behavior on
  * unwatermarked text (plus an exact JVM replay of the md5 greenlist
  * coin), and χ²'s ordering/consistency invariants. */
class R10dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_containment -----------------------------------------------------

  test("containment: axioms hold and the planted exact duplicates " +
      "surface at containment 1.0") {
    val rows = CurateOps.qContainment(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, na, nb, c) =>
      assert(a < b)
      assert(inter <= math.min(na, nb))
      assert(c >= 0.8 && c <= 1.0)
      assert(math.abs(c - inter.toDouble / math.min(na, nb)) < 1e-6)
    }
    assert(rows.exists(_._6 == 1.0),
      "fixture plants exact dups — containment 1.0 pairs must exist")
  }

  test("containment: the df<=1000 stop-shingle cut is a no-op on this " +
      "fixture (max shingle df well below), so results are exact") {
    val maxDf = Tables.df(spark, sf, "documents")
      .select($"doc_id", explode(TextFunctions.shingles($"text", 3)).as("s"))
      .filter(size(split($"s", " ")) === 3)
      .distinct()
      .groupBy($"s").count()
      .agg(max($"count")).as[Long].head()
    assert(maxDf < 1000,
      s"fixture max shingle df $maxDf reached the stop-shingle cut — " +
        "the spec's exactness reading no longer holds")
  }

  // ---- q_watermark -------------------------------------------------------

  test("watermark: unwatermarked fixture must not flag (pinned), and " +
      "the z-scores stay in a plausible null band") {
    val rows = CurateOps.qWatermark(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._5 == 0L),
      "no source may flag docs on unwatermarked text")
    assert(rows.forall(r => math.abs(r._3) < 1.5),
      s"per-source mean z should hover near 0: ${rows.toSeq}")
    val nDocs = rows.map(_._2).sum
    val eligible = Tables.df(spark, sf, "documents")
      .filter(size(TextFunctions.tokens($"text")) >= 2).count()
    assert(nDocs == eligible, "every >=2-token doc is tested exactly once")
  }

  test("watermark: the md5 greenlist coin replays exactly in the JVM " +
      "for one document") {
    val doc = Tables.df(spark, sf, "documents")
      .select($"doc_id", lower($"text").as("t"))
      .orderBy($"doc_id").limit(1)
      .as[(Long, String)].head()
    val toks = doc._2.split(" ").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def green(prev: String, tok: String): Boolean = {
      val hex = md.digest(s"$prev|$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val g = toks.sliding(2).count(p => green(p(0), p(1)))
    val t = toks.length - 1
    val expectZ = BigDecimal((2.0 * g - t) / math.sqrt(t.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // recompute the same doc's z through the Spark path
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val sparkZ = Tables.df(spark, sf, "documents")
      .filter($"doc_id" === doc._1)
      .select($"doc_id",
        posexplode(TextFunctions.tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("prev", lag($"tok", 1).over(w))
      .filter($"prev".isNotNull)
      .withColumn("green",
        conv(substring(md5(concat($"prev", lit("|"), $"tok")), 1, 15),
          16, 10).cast("long") % 2 === 0)
      .groupBy($"doc_id")
      .agg(round((lit(2.0) * sum($"green".cast("long")) - count(lit(1)))
        / sqrt(count(lit(1))), 6).as("z"))
      .select($"z").as[Double].head()
    assert(math.abs(sparkZ - expectZ) < 1e-9,
      s"JVM replay $expectZ vs Spark $sparkZ for doc ${doc._1}")
  }

  // ---- q_chisq_terms -----------------------------------------------------

  test("chi2 terms: non-negative, ordered, direction consistent with " +
      "observed vs expected") {
    val rows = CorpusOps.qChisqTerms(spark, sf)
      .as[(String, String, Long, Long, Long, Double, Double, String)]
      .collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { case (_, _, nObs, nTerm, nLang, e, chi2, assoc) =>
      assert(nObs <= nTerm && nObs <= nLang)
      assert(e > 0.0 && chi2 >= 0.0)
      if (math.abs(nObs - e) > 1e-6)
        assert((nObs > e) == (assoc == "over"),
          s"direction must match observed-vs-expected: $nObs vs $e $assoc")
    }
    val c = rows.map(_._7)
    assert(c.sliding(2).forall(p => p.head >= p.last),
      "top-30 must be chi2-descending")
  }
}
