package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UDTF / LATERAL VIEW surface — Hive's generator framework
  * (UDTFOperator + LateralViewJoin/ForwardOperator; GenericUDTFExplode /
  * PosExplode / Stack / JSONTuple / Inline), mapped to Spark generators.
  *
  * Scale note: generators multiply row counts; every query here aggregates
  * straight back down (token counts) or runs on a key-sampled subset, so
  * the post-explode volume stays proportional to input. TRANSFORM-style
  * script piping is deliberately replaced by `Dataset.mapPartitions` (see
  * TextOps) — same per-partition contract, no external process.
  */
object Lateral extends QueryPack {

  /** explode(split(text)) → token frequencies (the canonical Hive
    * LATERAL VIEW explode example, DataFrame-first). */
  def qExplodeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok".asc)
  }

  /** posexplode — element + 0-based position, correlated with doc_id. */
  def qPosexplode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "documents")
      .filter($"doc_id" % 50 === 0)
      .select($"doc_id", posexplode(split($"text", " ")))
      .withColumnRenamed("col", "tok")
      .filter($"tok" =!= "")
      .orderBy($"doc_id", $"pos")
  }

  /** LATERAL VIEW via the HiveQL-compatible SQL surface (what a beeline
    * user of the reference deployment would type). */
  def qLateralView(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT lang, tok, COUNT(*) AS n
        |FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS tok
        |WHERE tok != ''
        |GROUP BY lang, tok
        |HAVING COUNT(*) > 5
        |ORDER BY lang, n DESC, tok""".stripMargin)
  }

  /** stack(n, …) — constant table generator pivoting two measures per part
    * into rows. */
  def qStack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "part")
      .filter($"p_partkey" % 100 === 0)
      .select($"p_partkey",
        expr("stack(2, 'size', CAST(p_size AS DOUBLE), " +
          "'price', p_retailprice)").as(Seq("metric", "value")))
      .orderBy($"p_partkey", $"metric")
  }

  /** json_tuple — multi-column JSON extraction (Hive GenericUDTFJSONTuple). */
  def qJsonTuple(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "events")
      .filter($"event_id" % 10 === 0)
      .select($"event_id", json_tuple($"props", "k").as("k"))
      .orderBy($"event_id")
  }

  /** inline(array(struct…)) — struct-array expansion. */
  def qInline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "region")
      .select($"r_regionkey",
        inline(array(
          struct(lit("name").as("attr"), $"r_name".as("v")),
          struct(lit("key").as("attr"),
            $"r_regionkey".cast("string").as("v")))))
      .orderBy($"r_regionkey", $"attr")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_explode_tokens" -> qExplodeTokens,
    "q_posexplode" -> qPosexplode,
    "q_lateral_view" -> qLateralView,
    "q_stack" -> qStack,
    "q_json_tuple" -> qJsonTuple,
    "q_inline" -> qInline
  )

  val oracle: Map[String, String] = Map(
    "q_explode_tokens" ->
      """SELECT tok, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |WHERE tok != ''
        |GROUP BY tok
        |ORDER BY n DESC NULLS LAST, tok ASC""".stripMargin,

    "q_posexplode" ->
      """SELECT d.doc_id, CAST(u.pos AS INT) AS pos, d.toks[u.pos + 1] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents WHERE doc_id % 50 = 0) d,
        |     unnest(range(len(d.toks))) AS u(pos)
        |WHERE d.toks[u.pos + 1] != ''
        |ORDER BY d.doc_id, pos""".stripMargin,

    "q_lateral_view" ->
      """SELECT lang, tok, COUNT(*) AS n
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |WHERE tok != ''
        |GROUP BY lang, tok
        |HAVING COUNT(*) > 5
        |ORDER BY lang, n DESC NULLS LAST, tok""".stripMargin,

    "q_stack" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        |  FROM part WHERE p_partkey % 100 = 0
        |  UNION ALL
        |  SELECT p_partkey, 'price' AS metric, p_retailprice AS value
        |  FROM part WHERE p_partkey % 100 = 0)
        |ORDER BY p_partkey, metric""".stripMargin,

    "q_json_tuple" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events WHERE event_id % 10 = 0
        |ORDER BY event_id""".stripMargin,

    "q_inline" ->
      """SELECT r_regionkey, attr, v FROM (
        |  SELECT r_regionkey, 'name' AS attr, r_name AS v FROM region
        |  UNION ALL
        |  SELECT r_regionkey, 'key' AS attr, CAST(r_regionkey AS VARCHAR) AS v
        |  FROM region)
        |ORDER BY r_regionkey, attr""".stripMargin
  )
}
