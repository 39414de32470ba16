package graft

import graft.queries.{GovernOps, Series2Ops, Stats3Ops, Vector2Ops}
import org.apache.spark.sql.functions._

/** Batch-3 round-17 contracts: ICC/Box-Cox closed-form invariants,
  * Croston truncated-weight accounting, retention-sweep monotonicity,
  * and the CKA Cauchy–Schwarz bound. */
class R17cOpsSpec extends SparkSpec {

  test("q_icc: ICC(2,1) ∈ [−1, 1], mean squares non-negative, grid " +
      "accounting consistent") {
    val r = Stats3Ops.qIcc(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") > 1 && r.getAs[Long]("k") > 1)
    Seq("msr", "msc", "mse").foreach { c =>
      assert(r.getAs[Double](c) >= -1e-9, s"$c must be ≥ 0")
    }
    val icc = r.getAs[Double]("icc")
    assert(icc >= -1.0 - 1e-9 && icc <= 1.0 + 1e-9)
  }

  test("q_boxcox: 5 grid rows, a best row exists, and LL(1) replays " +
      "the plain-variance closed form (the (λ−1)Σln x term vanishes)") {
    import spark.implicits._
    val rows = Stats3Ops.qBoxcox(spark, sf).collect()
    assert(rows.map(_.getAs[Double]("lambda")).toSeq ==
      Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    assert(rows.count(_.getAs[Boolean]("is_best")) >= 1)
    val ll1 = rows.find(_.getAs[Double]("lambda") == 1.0).get
      .getAs[Double]("ll")
    val (n, varx) = Tables.df(spark, sf, "orders")
      .select($"o_totalprice".cast("double").as("x")).filter($"x" > 0)
      .agg(count(lit(1)), var_pop($"x")).as[(Long, Double)].head()
    assert(math.abs(ll1 - (-0.5 * n * math.log(varx))) < 1e-2 * n,
      s"LL(1)=$ll1 vs closed form ${-0.5 * n * math.log(varx)}")
  }

  test("q_croston: weights use at most the last 8 demand days, " +
      "intervals are ≥ 1 day, and SBA is the 0.9-scaled Croston rate") {
    val rows = Series2Ops.qCroston(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val used = r.getAs[Long]("n_used")
      assert(used >= 1 && used <= 8)
      assert(used <= r.getAs[Long]("n_demand_days"))
      assert(r.getAs[Double]("z_hat") > 0)
      Option(r.getAs[java.lang.Double]("p_hat")).foreach { p =>
        assert(p >= 1.0 - 1e-9, "demand-day gaps are whole days")
      }
      (Option(r.getAs[java.lang.Double]("croston_rate")),
        Option(r.getAs[java.lang.Double]("sba_rate"))) match {
        case (Some(c), Some(s)) =>
          assert(math.abs(s - 0.9 * c) < 1e-5, s"sba $s vs 0.9×$c")
        case (None, None) => ()
        case other => fail(s"rate nullability must agree: $other")
      }
    }
  }

  test("q_retention_sweep: a shorter policy never drops fewer rows, " +
      "and the oldest kept day sits inside the policy window") {
    val rows = GovernOps.qRetentionSweep(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byPolicy = rs.sortBy(_.getAs[Int]("policy_days"))
      assert(byPolicy.map(_.getAs[Int]("policy_days")).toSeq ==
        Seq(30, 60, 90))
      val drops = byPolicy.map(_.getAs[Long]("rows_dropped"))
      assert(drops.zip(drops.tail).forall { case (a, b) => b <= a },
        "30-day retention must drop at least as much as 60/90")
      byPolicy.foreach { r =>
        assert(r.getAs[Long]("rows_dropped") <= r.getAs[Long]("n_rows"))
      }
    }
  }

  test("q_cka: Cauchy–Schwarz bounds CKA in [0, 1], norms positive, " +
      "count covers the store") {
    import spark.implicits._
    val r = Vector2Ops.qCka(spark, sf).collect().head
    val n = Tables.df(spark, sf, "embeddings").count()
    assert(r.getAs[Long]("n_vecs") === n)
    assert(r.getAs[Double]("hsic_xy") >= -1e-9)
    assert(r.getAs[Double]("norm_x") > 0 && r.getAs[Double]("norm_y") > 0)
    val cka = r.getAs[Double]("cka")
    assert(cka >= -1e-9 && cka <= 1.0 + 1e-6,
      s"‖XᵀY‖² ≤ ‖XᵀX‖·‖YᵀY‖ forces CKA ≤ 1, got $cka")
  }
}
