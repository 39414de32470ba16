package graft

import graft.queries.{GovernOps, VectorQueries}
import org.apache.spark.sql.functions._

/** Batch-5 round-17 contracts: membership-inference direction and
  * identities, semantic-cache monotonicity and first-miss accounting. */
class R17eOpsSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_mia_audit: AUC bounds and identities, population accounted, " +
      "and the resubstitution direction (members score lower NLL)") {
    val r = GovernOps.qMiaAudit(spark, sf).collect().head
    val nDocs = Tables.df(spark, sf, "documents").count()
    assert(r.getAs[Long]("n_members") + r.getAs[Long]("n_nonmembers")
      === nDocs)
    val auc = r.getAs[Double]("attack_auc")
    assert(auc >= 0 && auc <= 1.0 + 1e-9)
    assert(auc >= 0.45,
      s"the LM trained ON the member half must not score members as " +
        s"LESS likely than holdouts — auc $auc reads inverted")
    assert(r.getAs[Double]("advantage") === rnd(2 * math.abs(auc - 0.5), 6))
    assert(r.getAs[Boolean]("leaky") === (auc > 0.6))
  }

  test("q_semcache: hit rate is nonincreasing in tau, the first arrival " +
      "always misses, and the query decile is fully counted") {
    import spark.implicits._
    val rows = VectorQueries.qSemcache(spark, sf).collect()
    assert(rows.map(_.getAs[Double]("tau")).toSeq ==
      Seq(0.70, 0.80, 0.90, 0.95))
    val nQ = Tables.df(spark, sf, "embeddings")
      .filter($"vec_id" % 25 === 0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") === nQ)
      assert(r.getAs[Long]("hits") <= nQ - 1,
        "the first arrival has no cache to hit")
    }
    val hr = rows.map(_.getAs[Double]("hit_rate"))
    assert(hr.zip(hr.tail).forall { case (a, b) => b <= a + 1e-9 },
      "a stricter threshold cannot hit more")
  }
}
