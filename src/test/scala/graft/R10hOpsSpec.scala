package graft

import graft.queries.{Analytics, GraphOps}
import org.apache.spark.sql.functions._

/** Properties of the round-10h graph/shrinkage operators: HITS replayed
  * against a dense in-memory power-iteration reference, the graph
  * summary's structural identities with a brute-force assortativity,
  * and Beta-Binomial shrinkage's between-ness property. */
class R10hOpsSpec extends SparkSpec {
  import spark.implicits._

  private def directedEdges(): Seq[(Long, Long)] = {
    val li = Tables.df(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ords = Tables.df(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey")
    li.join(ords, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as[Long], $"l_suppkey".as[Long])
      .distinct().collect().toSeq
  }

  // ---- q_hits ------------------------------------------------------------

  test("hits: top authorities/hubs match an in-memory HITS reference") {
    val rows = GraphOps.qHits(spark, sf)
      .as[(String, String, Double)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("auth", "hub"))
    assert(rows.count(_._1 == "auth") <= 15 &&
      rows.count(_._1 == "hub") <= 15)
    rows.foreach { case (kind, node, score) =>
      assert(score > 0.0 && score < 1.0)
      assert(if (kind == "auth") node.startsWith("s:")
        else node.startsWith("c:"))
    }
    // reference: same 2 iterations, same 9dp rounding, dense maps
    val e = directedEdges()
    def l1(m: Map[Long, Double]): Map[Long, Double] = {
      val s = m.values.sum
      m.map { case (k, v) =>
        k -> BigDecimal(v / s).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    var a = l1(e.groupBy(_._2).view.mapValues(_.size.toDouble).toMap)
    var h = l1(e.groupBy(_._1).view
      .mapValues(_.map(p => a(p._2)).sum).toMap)
    a = l1(e.groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap)
    h = l1(e.groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap)
    rows.foreach { case (kind, node, score) =>
      val id = node.drop(2).toLong
      val want = if (kind == "auth") a(id) else h(id)
      assert(math.abs(score - want) < 1e-6,
        s"$kind $node: $score vs reference $want")
    }
  }

  // ---- q_graph_stats -----------------------------------------------------

  test("graph stats: structural identities hold and assortativity " +
      "matches brute force") {
    val r = GraphOps.qGraphStats(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val (nNodes, nEdges, minDeg, maxDeg, meanDeg, assort) = r
    val e = directedEdges().map { case (c, s) => (c * 2, s * 2 + 1) }
    val sym = e ++ e.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(nNodes == deg.size)
    assert(nEdges == e.size)
    assert(minDeg == deg.values.min && maxDeg == deg.values.max)
    assert(math.abs(meanDeg - deg.values.sum.toDouble / deg.size) < 1e-5)
    assert(assort >= -1.0 && assort <= 1.0)
    val xs = sym.map(p => deg(p._1).toDouble)
    val ys = sym.map(p => deg(p._2).toDouble)
    val m = sym.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val want = (m * sxy - sx * sy) /
      (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy))
    assert(math.abs(assort - want) < 1e-5,
      s"assortativity $assort vs brute force $want")
  }

  // ---- q_ctr_smooth ------------------------------------------------------

  test("ctr smoothing: shrinkage lands between the raw rate and the " +
      "prior mean, harder for low-evidence users") {
    val rows = Analytics.qCtrSmooth(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val (alpha, beta) = (rows.head._5, rows.head._6)
    assert(alpha > 0.0 && beta > 0.0,
      "fixture rates vary, so the Beta fit must be proper")
    val priorMean = alpha / (alpha + beta)
    rows.foreach { case (_, n, p, rate, a, b, sm) =>
      assert(a == alpha && b == beta, "one global prior")
      assert(p <= n)
      val lo = math.min(rate, priorMean) - 1e-6
      val hi = math.max(rate, priorMean) + 1e-6
      assert(sm >= lo && sm <= hi,
        s"shrunk rate $sm outside [$lo, $hi] (raw $rate, prior $priorMean)")
      val want = (p + alpha) / (n + alpha + beta)
      assert(math.abs(sm - want) < 1e-5)
    }
    val keys = rows.map(r => (-r._7, r._1)).toSeq
    assert(keys == keys.sorted, "ordered by smoothed desc")
  }
}
