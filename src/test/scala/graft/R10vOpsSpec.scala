package graft

import graft.queries.CorpusOps

/** Properties of the Good–Turing re-estimation: the textbook N_r
  * ladder on trigram types, total-mass conservation (Σ N_r·p_gt plus
  * the unseen mass stays below 1), and the smoothing direction
  * (adjusted counts discount singletons). */
class R10vOpsSpec extends SparkSpec {
  import spark.implicits._

  test("good-turing: decreasing ladder, singleton discount, masses " +
      "coherent") {
    val rows = CorpusOps.qGoodTuring(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double], Double)]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._1 == 1L, "trigram types must include singletons")
    assert(rows.head._5 > 0.0 && rows.head._5 < 1.0,
      "unseen mass P0 = N1/N in (0,1)")
    // the low-r ladder decreases (the reason GT works at all)
    val lowLadder = rows.takeWhile(_._1 <= 4).map(_._2)
    assert(lowLadder.sliding(2).forall(p => p.head >= p.last),
      s"N_r must fall with r on the low ladder: ${lowLadder.toSeq}")
    // r* < r for r = 1 (singletons are discounted toward the unseen)
    rows.find(_._1 == 1).flatMap(_._3).foreach { rStar =>
      assert(rStar < 1.0,
        s"GT must discount singletons: r*(1) = $rStar")
    }
    // adjusted probability mass over reported rows stays below 1
    val mass = rows.flatMap(r => r._4.map(_ * r._2)).sum
    assert(mass > 0.0 && mass + rows.head._5 <= 1.0 + 1e-6,
      s"Σ N_r·p_gt + P0 = ${mass + rows.head._5} must not exceed 1")
    // r* replays from adjacent N_r cells
    val byR = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (r, nR, rStar, _, _) =>
      byR.get(r + 1) match {
        case Some(n1) => rStar.foreach { v =>
          assert(math.abs(v - (r + 1).toDouble * n1 / nR) < 1e-4)
        }
        case None => assert(rStar.isEmpty,
          s"a gap at ${r + 1} must yield a NULL adjustment")
      }
    }
  }
}
