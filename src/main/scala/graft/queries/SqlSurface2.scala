package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface additions enabled by Spark 4.x (r14): linear recursive
  * CTEs (SPARK-24497 landed the `WITH RECURSIVE ... UNION ALL` form)
  * and native `UNPIVOT` — two constructs the deployed HiveQL 1.2 engine
  * never had, registered the way the TRANSFORM/LATERAL rows are: prove
  * the surface works end-to-end under the DuckDB oracle, and document
  * where its 100 TB limits are (Spark's recursion supports only UNION
  * ALL, so cyclic closures still belong to operators/Components — the
  * star-contraction path; recursion here is for LINEAR, bounded-depth
  * chains).
  */
object SqlSurface2 extends QueryPack {

  // ---- q_recursive_backlog -------------------------------------------------
  /** Service-backlog simulation as a native linear recursive CTE:
    * backlog_t = max(0, backlog_{t−1} + arrivals_t − capacity) over the
    * WEEKLY event-arrival series, capacity frozen at the integer mean
    * weekly arrival rate — the queueing read ("how deep does the
    * backlog get, and does it drain?") a capacity planner runs on
    * ingest logs. The recursion is LINEAR (one row per week) and
    * all-integer, so both engines replay it exactly. Week grain, not
    * day: Spark 4.1's UnionLoop executes one JOB per recursion step
    * (~0.3 s of driver dispatch each, measured — 8.0 s wall vs 2.0
    * core-s at day grain), so the iteration count is the entire cost
    * of this surface; five steps demonstrate the construct at honest
    * price. The same recursion collapses to prefix arithmetic
    * (q_cusum's running-sum-minus-prefix-min identity) — the spec
    * cross-checks the recursive answer against that closed form, which
    * is also the shape to prefer when a recursion's depth grows with
    * the data. */
  def qRecursiveBacklog(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.df(spark, sfDir, "events").createOrReplaceTempView("events_v")
    spark.sql(recursiveBacklogSql("events_v"))
  }

  /** One SQL text for both engines (only the table name differs) —
    * the q_distribute_sql discipline for surface ops. */
  private def recursiveBacklogSql(tbl: String): String =
    s"""WITH RECURSIVE arr AS (
       |  SELECT date_trunc('week', CAST(ts AS DATE)) AS wk, count(*) AS a
       |  FROM $tbl GROUP BY 1),
       |weeks AS (
       |  SELECT wk, a, CAST(row_number() OVER (ORDER BY wk) AS INT) AS t
       |  FROM arr),
       |cap AS (
       |  -- explicit floor: a bare BIGINT/BIGINT is float division in
       |  -- both engines, but the double->BIGINT CAST truncates in Spark
       |  -- and rounds in DuckDB; floor() is the shared exact form
       |  SELECT CAST(floor(CAST(sum(a) AS DOUBLE) / count(*)) AS BIGINT)
       |    AS c FROM weeks),
       |sim(t, wk, a, backlog) AS (
       |  SELECT t, wk, a,
       |    CAST(greatest(a - (SELECT c FROM cap), 0) AS BIGINT)
       |  FROM weeks WHERE t = 1
       |  UNION ALL
       |  SELECT weeks.t, weeks.wk, weeks.a,
       |    CAST(greatest(sim.backlog + weeks.a - (SELECT c FROM cap), 0)
       |      AS BIGINT)
       |  FROM sim JOIN weeks ON weeks.t = sim.t + 1)
       |SELECT t, CAST(wk AS DATE) AS wk, a AS arrivals, backlog
       |FROM sim ORDER BY t""".stripMargin

  // ---- q_unpivot -----------------------------------------------------------
  /** Native SQL UNPIVOT of a wide per-region revenue summary into the
    * long (region, metric, value) shape — the wide→long reshaping
    * surface (q_pivot's inverse), run through the actual UNPIVOT
    * operator in BOTH engines rather than a hand-written stack().
    * Metrics cast to one double column (UNPIVOT requires a common
    * type); money sums are decimal internally and cast once at the
    * edge (SURVEY §7.4). */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("region", "nation", "customer", "orders").foreach { t =>
      Tables.df(spark, sfDir, t).createOrReplaceTempView(t + "_v")
    }
    spark.sql(unpivotSql("region_v", "nation_v", "customer_v",
      "orders_v"))
  }

  private def unpivotSql(region: String, nation: String, customer: String,
      orders: String): String =
    s"""WITH wide AS (
       |  SELECT r.r_name AS region,
       |    CAST(count(DISTINCT c.c_custkey) AS DOUBLE) AS n_customers,
       |    CAST(count(o.o_orderkey) AS DOUBLE) AS n_orders,
       |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |      AS total_rev,
       |    CAST(max(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |      AS max_order
       |  FROM $region r
       |  JOIN $nation n ON n.n_regionkey = r.r_regionkey
       |  JOIN $customer c ON c.c_nationkey = n.n_nationkey
       |  JOIN $orders o ON o.o_custkey = c.c_custkey
       |  GROUP BY r.r_name)
       |SELECT region, metric, round(value, 2) AS value
       |FROM wide
       |UNPIVOT (value FOR metric IN
       |  (n_customers, n_orders, total_rev, max_order))
       |ORDER BY region, metric""".stripMargin

  // ---- q_variant_extract ---------------------------------------------------
  /** The Spark 4 VARIANT semi-structured type end-to-end: build a JSON
    * metadata document per row, `parse_json` it into a VARIANT, and
    * read typed paths back out with `variant_get` (nested object
    * field, integer, array element) plus `try_variant_get` on a
    * missing path (NULL, not an error) — the open-schema ingestion
    * surface that replaces string-typed JSON columns (binary variant
    * encoding, typed extraction, no per-query re-parse). The oracle
    * replays the same paths through DuckDB's JSON extraction — the
    * VALUES must agree even though the storage encodings differ,
    * which is exactly the portability claim a semi-structured column
    * needs. Pure projection — no shuffle anywhere. */
  def qVariantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.df(spark, sfDir, "documents")
      .createOrReplaceTempView("documents_v")
    spark.sql("""
      WITH js AS (
        SELECT doc_id,
          parse_json(concat('{"id": ', CAST(doc_id AS STRING),
            ', "meta": {"lang": "', lang, '", "n": ',
            CAST(n_chars AS STRING), '}, "tags": ["', source,
            '", "fixed"]}')) AS v
        FROM documents_v WHERE doc_id % 20 = 0)
      SELECT doc_id,
        variant_get(v, '$.meta.lang', 'string') AS lang,
        variant_get(v, '$.meta.n', 'bigint') AS n_chars,
        variant_get(v, '$.tags[0]', 'string') AS tag0,
        try_variant_get(v, '$.missing', 'string') AS missing
      FROM js ORDER BY doc_id""")
  }

  // ---- q_sql_modern --------------------------------------------------------
  /** The modern-SQL aggregate surface in one registered row — the
    * functions an analyst migrating from a 2015-era HiveQL deployment
    * gains: `GROUP BY ALL`, `listagg(...) WITHIN GROUP (ORDER BY ...)`
    * (SQL:2023, Spark 4), `count_if`, `median`, and `bool_and/bool_or`
    * — all per order priority. Determinism: listagg runs over the
    * pre-DISTINCTed (priority, status) relation with an explicit ORDER
    * BY (never raw rows); median casts to double first so both engines
    * interpolate the same quantile_cont arithmetic; the nondeterministic
    * members of the family (any_value on non-constant groups, mode on
    * ties) are deliberately absent — they are the same trap
    * q_agg_distinct documents on the DISTINCT side. */
  def qSqlModern(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.df(spark, sfDir, "orders").createOrReplaceTempView("orders_v2")
    spark.sql("""
      WITH st AS (
        SELECT DISTINCT o_orderpriority AS pri, o_orderstatus AS s
        FROM orders_v2),
      ag AS (
        SELECT pri,
          listagg(s, ',') WITHIN GROUP (ORDER BY s) AS statuses
        FROM st GROUP BY ALL)
      SELECT o.o_orderpriority AS pri, ag.statuses,
        count(*) AS n,
        count_if(CAST(o.o_totalprice AS DECIMAL(18,2)) > 150000) AS n_big,
        round(median(CAST(o.o_totalprice AS DOUBLE)), 2) AS med_price,
        bool_and(o.o_totalprice > 0) AS all_positive,
        bool_or(o.o_orderstatus = 'F') AS any_finished
      FROM orders_v2 o JOIN ag ON ag.pri = o.o_orderpriority
      GROUP BY ALL
      ORDER BY pri""")
  }

  // ---- q_try_arith ---------------------------------------------------------
  /** The ANSI-mode `try_*` error-safe arithmetic surface in one oracled
    * row set — Spark 4 runs under ANSI SQL where overflow, division by
    * zero, bad casts, and out-of-range element access THROW; the try_
    * family is the documented per-expression escape hatch an ETL
    * pipeline uses for dirty columns (Hive's pre-ANSI silent-NULL
    * behavior, now opt-in and explicit). Exercised per row over the
    * first 50 orders: try_divide (NULL at divisor 0 — where plain
    * double division would give Infinity), try_add / try_multiply at
    * the BIGINT overflow boundary (NULL past 2⁶³−1), try_cast of a
    * malformed numeric string, and try_element_at past the array end.
    * The DuckDB oracle computes the expected VALUES via guarded CASE
    * arithmetic + TRY_CAST, proving the semantics portable rather than
    * engine-folklore. Pure projection — no shuffle, codegen'd. */
  def qTryArith(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.df(spark, sfDir, "orders").createOrReplaceTempView("orders_try")
    spark.sql("""
      SELECT o_orderkey,
        try_divide(CAST(o_orderkey AS BIGINT), o_orderkey % 5) AS div5,
        try_add(9223372036854775807, o_orderkey % 2) AS add_ovf,
        try_multiply(4611686018427387904, o_orderkey % 4) AS mul_ovf,
        try_cast(CASE WHEN o_orderkey % 3 = 0 THEN '123'
          ELSE 'x12' END AS INT) AS cast_int,
        try_element_at(array(10, 20, 30),
          CAST(o_orderkey % 5 + 1 AS INT)) AS elem
      FROM orders_try
      WHERE o_orderkey < 50
      ORDER BY o_orderkey""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_recursive_backlog" -> qRecursiveBacklog,
    "q_unpivot" -> qUnpivot,
    "q_variant_extract" -> qVariantExtract,
    "q_sql_modern" -> qSqlModern,
    "q_try_arith" -> qTryArith
  )

  val oracle: Map[String, String] = Map(
    "q_recursive_backlog" -> recursiveBacklogSql("events"),
    "q_unpivot" -> unpivotSql("region", "nation", "customer", "orders"),
    // expected values via guarded CASE arithmetic + TRY_CAST — the
    // portable statement of Spark's try_* semantics
    "q_try_arith" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |    ELSE CAST(o_orderkey AS DOUBLE) / (o_orderkey % 5) END
        |    AS div5,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 9223372036854775807
        |    ELSE NULL END AS add_ovf,
        |  CASE WHEN o_orderkey % 4 = 0 THEN CAST(0 AS BIGINT)
        |    WHEN o_orderkey % 4 = 1 THEN 4611686018427387904
        |    ELSE NULL END AS mul_ovf,
        |  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN '123'
        |    ELSE 'x12' END AS INTEGER) AS cast_int,
        |  CASE WHEN o_orderkey % 5 + 1 <= 3
        |    THEN ([10, 20, 30])[CAST(o_orderkey % 5 + 1 AS INT)]
        |    END AS elem
        |FROM orders
        |WHERE o_orderkey < 50
        |ORDER BY o_orderkey""".stripMargin,
    // same aggregates; DuckDB's listagg takes ORDER BY inline rather
    // than WITHIN GROUP, otherwise the texts match
    "q_sql_modern" ->
      """WITH st AS (
        |  SELECT DISTINCT o_orderpriority AS pri, o_orderstatus AS s
        |  FROM orders),
        |ag AS (
        |  SELECT pri, listagg(s, ',' ORDER BY s) AS statuses
        |  FROM st GROUP BY ALL)
        |SELECT o.o_orderpriority AS pri, ag.statuses,
        |  count(*) AS n,
        |  CAST(count_if(CAST(o.o_totalprice AS DECIMAL(18,2)) > 150000)
        |    AS BIGINT) AS n_big,
        |  round(median(CAST(o.o_totalprice AS DOUBLE)), 2) AS med_price,
        |  bool_and(o.o_totalprice > 0) AS all_positive,
        |  bool_or(o.o_orderstatus = 'F') AS any_finished
        |FROM orders o JOIN ag ON ag.pri = o.o_orderpriority
        |GROUP BY ALL
        |ORDER BY pri""".stripMargin,

    // DuckDB JSON extraction over the same constructed document — the
    // typed values must match Spark's variant_get reads
    "q_variant_extract" ->
      """WITH js AS (
        |  SELECT doc_id,
        |    '{"id": ' || CAST(doc_id AS VARCHAR)
        |      || ', "meta": {"lang": "' || lang || '", "n": '
        |      || CAST(n_chars AS VARCHAR) || '}, "tags": ["' || source
        |      || '", "fixed"]}' AS v
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id,
        |  json_extract_string(v, '$.meta.lang') AS lang,
        |  CAST(json_extract(v, '$.meta.n') AS BIGINT) AS n_chars,
        |  json_extract_string(v, '$.tags[0]') AS tag0,
        |  json_extract_string(v, '$.missing') AS missing
        |FROM js ORDER BY doc_id""".stripMargin
  )
}
