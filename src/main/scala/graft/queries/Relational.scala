package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational surface: scan → filter → project → hash-agg → sort.
  *
  * Mirrors the query semantics of the Hive engine the reference charm
  * deploys (reference: `actions/smoke-test` exercises exactly this
  * create→select→aggregate round-trip; the execution-side loci are Hive's
  * TableScanOperator/FilterOperator/SelectOperator/GroupByOperator). Here the
  * whole pipeline is declarative DataFrame code so Catalyst pushes filters
  * and prunes columns into the parquet scan and Tungsten runs the hash
  * aggregate in whole-stage codegen.
  *
  * Scale note: q1-style partial/final hash aggregation over a handful of
  * group keys is the canonical 100 TB-safe shape — map-side combine reduces
  * each partition to ≤|groups| rows before the shuffle.
  */
object Relational extends QueryPack {

  /** Money column → exact decimal, so sums are order-independent and
    * hash-stable against the DuckDB oracle (SURVEY.md §7.4 trap #1). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H Q1-shaped pricing summary (flagship). */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("2000-09-01")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
            * (lit(1) + dec($"l_tax")))
          .cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count($"l_quantity"))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1Pricing
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
