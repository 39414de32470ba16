package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations. Hive 1.2 ships only UNION [ALL|DISTINCT]
  * (UnionOperator + a group-by dedup rewrite); INTERSECT/EXCEPT arrived in
  * Hive 2.3 — Spark has them natively so we expose the full matrix.
  * Scale note: `union` is a zero-shuffle concatenation of partitions;
  * only the DISTINCT variants shuffle (hash-agg on the full row).
  */
object SetOps extends QueryPack {

  /** UNION ALL keeps duplicates: urgent orders ∪ high-value orders. */
  def qUnionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.df(spark, sfDir, "orders")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val highValue = o.filter($"o_totalprice" > 150000)
      .select($"o_orderkey")
    urgent.unionAll(highValue).orderBy($"o_orderkey")
  }

  /** UNION DISTINCT (Hive's bare UNION): same sources, deduplicated. */
  def qUnionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.df(spark, sfDir, "orders")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val highValue = o.filter($"o_totalprice" > 150000)
      .select($"o_orderkey")
    urgent.union(highValue).distinct().orderBy($"o_orderkey")
  }

  /** INTERSECT: customers in the BUILDING segment who also placed an
    * F-status order. */
  def qIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val building = Tables.df(spark, sfDir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
    val fOrders = Tables.df(spark, sfDir, "orders")
      .filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
    building.intersect(fOrders).orderBy($"k")
  }

  /** EXCEPT: customers with orders, minus the BUILDING segment. */
  def qExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withOrders = Tables.df(spark, sfDir, "orders")
      .select($"o_custkey".as("k"))
    val building = Tables.df(spark, sfDir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
    withOrders.except(building).orderBy($"k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_all" -> qUnionAll,
    "q_union_distinct" -> qUnionDistinct,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept
  )

  val oracle: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT o_custkey AS k FROM orders
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY k""".stripMargin
  )
}
