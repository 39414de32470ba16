package graft

import graft.queries.{CurateOps, EventOps, GovernOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10p evaluation operators: the silhouette's
  * bounds and vector conservation, the KS matrix's metric axioms with
  * one pair brute-forced, and the sequential test's pinned null on the
  * parity experiment (the always-valid guarantee doing its job). */
class R10pOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_silhouette ------------------------------------------------------

  test("silhouette: centroid-variant bounds [0,1], vectors conserved " +
      "across clusters") {
    val rows = CurateOps.qSilhouette(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val nVec = Tables.df(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == nVec,
      "every vector gets exactly one silhouette")
    rows.foreach { case (cid, _, mean, mn) =>
      assert(cid >= 1 && cid <= 4)
      // a is the min distance by construction, so s = (b-a)/max >= 0
      assert(mn >= 0.0 && mean >= mn - 1e-9 && mean <= 1.0)
    }
  }

  // ---- q_ks_matrix -------------------------------------------------------

  test("ks matrix: full pair spine, D in [0,1], one pair matches a " +
      "brute-force two-sample walk") {
    val rows = GovernOps.qKsMatrix(spark, sf)
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    val nSrc = Tables.df(spark, sf, "documents")
      .select($"source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      s"must report every source pair: ${rows.length}")
    rows.foreach { case (s1, s2, n1, n2, d, _, p) =>
      assert(s1 < s2 && n1 > 0 && n2 > 0)
      assert(d >= 0.0 && d <= 1.0 && p >= 0.0 && p <= 1.0)
    }
    val (s1, s2, _, _, dWant, _, _) = rows.head
    val a = Tables.df(spark, sf, "documents").filter($"source" === s1)
      .select($"n_chars".as[Long]).collect().sorted
    val b = Tables.df(spark, sf, "documents").filter($"source" === s2)
      .select($"n_chars".as[Long]).collect().sorted
    val pooled = (a ++ b).distinct.sorted
    val d = pooled.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length
        - b.count(_ <= v).toDouble / b.length)
    }.max
    assert(math.abs(dWant - d) < 1e-5, s"($s1,$s2): $dWant vs $d")
  }

  // ---- q_msprt -----------------------------------------------------------

  test("msprt: cumulative counts monotone, boundary decreasing, and " +
      "the parity null never crosses (pinned — the always-valid " +
      "guarantee)") {
    val rows = EventOps.qMsprt(spark, sf)
      .as[(String, Long, Long, Long, Long, Option[Double], Double,
        Boolean)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val ns = rows.map(r => r._2 + r._3)
    assert(ns.sliding(2).forall(p => p.head <= p.last),
      "cumulative sample sizes grow")
    val bounds = rows.map(_._7)
    assert(bounds.sliding(2).forall(p => p.head >= p.last - 1e-9),
      "the always-valid boundary tightens as evidence accumulates")
    assert(rows.forall(!_._8),
      "user-id parity is a true null — a crossing is a false positive " +
        "the always-valid boundary exists to prevent")
    // closed-form replay of the last day's boundary
    val n = ns.last.toDouble
    val want = math.sqrt((n + 100) / n * math.log((n + 100) / 100 / 0.0025))
    assert(math.abs(bounds.last - want) < 1e-4)
  }
}
