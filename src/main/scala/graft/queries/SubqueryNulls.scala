package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Correlated-subquery decorrelation (Hive: calcite subquery transforms →
  * Catalyst RewriteCorrelatedScalarSubquery) and three-valued NULL
  * semantics. The fixtures contain no NULLs, so qNullSemantics
  * manufactures them with nullif() and then exercises the null-sensitive
  * surface: COUNT(*) vs COUNT(col), aggregates skipping nulls, GROUP BY on
  * a nullable key, null-safe equality, and explicit null ordering.
  */
object SubqueryNulls extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Correlated scalar subquery per part (decorrelated by Catalyst into a
    * left outer aggregate join). */
  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT p_partkey, p_type,
        |  (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS min_price,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS n_lines
        |FROM part WHERE p_partkey % 40 = 0
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Correlated EXISTS with an extra inequality (beyond plain semi join). */
  def qCorrelatedExists(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey % 10 = 0
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_extendedprice > o_totalprice / 2)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Three-valued logic over manufactured NULLs. */
  def qNullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "orders")
      .select($"o_orderkey",
        nullif($"o_orderstatus", lit("P")).as("st"),
        when($"o_totalprice" > 150000, $"o_totalprice").as("big_price"))
      .groupBy($"st")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"big_price").as("n_big"),        // skips nulls
        coalesce(sum(dec($"big_price")).cast("double"), lit(0.0))
          .as("sum_big"),                        // sum skips nulls
        count(when($"big_price".isNull, 1)).as("n_null_big"),
        sum(($"st" <=> lit("F")).cast("long")).as("n_nullsafe_f"))
      .orderBy($"st".asc_nulls_first)
      // The NULL group key itself is the 3VL test surface *inside* the
      // aggregates; emit a sentinel in the output so the comparator never
      // hashes a NULL key (engine NULL-vs-NaN representation drift).
      .select(coalesce($"st", lit("<null>")).as("st"),
        $"n_rows", $"n_big", $"sum_big", $"n_null_big",
        $"n_nullsafe_f".cast("long").as("n_nullsafe_f"))
  }

  /** SQL named windows (`WINDOW w AS (...)` — Hive 0.11+ clause surface). */
  def qNamedWindowSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WHERE o_custkey % 50 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** TABLESAMPLE: engine-specific row selection → rows-only check; the
    * deterministic assertions live in the unit tests (seeded fraction
    * sample is reproducible within Spark, not across engines). */
  def qTablesample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "lineitem")
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_subquery" -> qScalarSubquery,
    "q_correlated_exists" -> qCorrelatedExists,
    "q_null_semantics" -> qNullSemantics,
    "q_named_window_sql" -> qNamedWindowSql,
    "q_tablesample" -> qTablesample
  )

  val oracle: Map[String, String] = Map(
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_type,
        |  (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS min_price,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_partkey = p_partkey) AS n_lines
        |FROM part WHERE p_partkey % 40 = 0
        |ORDER BY p_partkey""".stripMargin,

    "q_correlated_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey % 10 = 0
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_extendedprice > o_totalprice / 2)
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_semantics" ->
      """SELECT COALESCE(st, '<null>') AS st,
        |  COUNT(*) AS n_rows, COUNT(big_price) AS n_big,
        |  COALESCE(CAST(SUM(CAST(big_price AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        |    AS sum_big,
        |  COUNT(CASE WHEN big_price IS NULL THEN 1 END) AS n_null_big,
        |  CAST(SUM(CAST(st IS NOT DISTINCT FROM 'F' AS BIGINT)) AS BIGINT)
        |    AS n_nullsafe_f
        |FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
        |        CASE WHEN o_totalprice > 150000 THEN o_totalprice END
        |          AS big_price
        |      FROM orders)
        |GROUP BY st
        |ORDER BY st ASC NULLS FIRST""".stripMargin,

    "q_named_window_sql" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WHERE o_custkey % 50 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    // q_tablesample: rows-only (sampling is engine-specific)
  )
}
