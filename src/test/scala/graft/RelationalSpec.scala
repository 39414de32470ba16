package graft

import graft.queries.{Joins, Relational, SetOps}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q1 pricing groups are unique and counts add up") {
    val rows = Relational.q1Pricing(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.df(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-01"))).count()
    assert(total === expected)
  }

  test("predicates filter is a subset of the base table") {
    val n = Relational.q2Predicates(spark, sf).count()
    val base = Tables.df(spark, sf, "orders").count()
    assert(n > 0 && n < base)
  }

  test("top-k returns exactly k rows in non-increasing order") {
    val spend = Relational.qTopK(spark, sf).collect()
      .map(_.getAs[Double]("total_spend"))
    assert(spend.length === 15)
    assert(spend.zip(spend.tail).forall { case (a, b) => a >= b })
  }

  test("union all row count is additive; union distinct is bounded by it") {
    val all = SetOps.qUnionAll(spark, sf).count()
    val dis = SetOps.qUnionDistinct(spark, sf).count()
    assert(dis <= all)
    import spark.implicits._
    val o = Tables.df(spark, sf, "orders")
    val a = o.filter($"o_orderpriority" === "1-URGENT").count()
    val b = o.filter($"o_totalprice" > 150000).count()
    assert(all === a + b)
  }

  test("semi and anti joins partition the left table") {
    import spark.implicits._
    val orders = Tables.df(spark, sf, "orders")
    val big = Tables.df(spark, sf, "lineitem").filter($"l_quantity" >= 49)
    val semi = orders.join(big, $"o_orderkey" === $"l_orderkey", "left_semi").count()
    val anti = orders.join(big, $"o_orderkey" === $"l_orderkey", "left_anti").count()
    assert(semi + anti === orders.count())
  }

  test("full outer join covers keys from both sides") {
    val rows = Joins.qFullOuter(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("nationkey")).distinct.length === rows.length)
    assert(rows.forall(r => r.getAs[Long]("n_customers") > 0
      || r.getAs[Long]("n_suppliers") > 0))
  }

  test("theta pairs are strictly ordered within region") {
    val pairs = Joins.qThetaPairs(spark, sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getAs[String]("name1") != r.getAs[String]("name2")))
  }

  test("broadcast join plan is used for q3's customer dimension") {
    val plan = Joins.q3Shipping(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
