package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming transforms (SURVEY.md §2.10): the same
  * Streams.* code paths, run over the static events table so the DuckDB
  * oracle can hash-check their semantics. Watermark/late-data behavior is
  * covered by MemoryStream unit tests (StreamingSpec) since a batch oracle
  * cannot observe it.
  *
  * Spark's tumbling/sliding windows are epoch-aligned, so the oracle
  * reconstructs bucket starts with floor(epoch/width)*width arithmetic —
  * engine-portable by construction.
  */
object EventOps extends QueryPack {

  def qTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.tumblingCounts(Tables.df(spark, sfDir, "events"), "5 minutes")
      .orderBy($"w_start", $"event_type")
  }

  def qSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.slidingCounts(Tables.df(spark, sfDir, "events"),
      "10 minutes", "5 minutes")
      .orderBy($"w_start", $"event_type")
  }

  def qSession(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.sessionize(Tables.df(spark, sfDir, "events"), "10 minutes")
      .orderBy($"user_id", $"s_start")
  }

  /** Batch twin of streaming dedup: double the stream, dedup by event_id
    * (keep-first is deterministic here because duplicates are identical). */
  def qDedupEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.df(spark, sfDir, "events")
    val doubled = ev.unionAll(ev)
    doubled.agg(count(lit(1)).as("n_before"))
      .crossJoin(doubled.dropDuplicates("event_id")
        .agg(count(lit(1)).as("n_after")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tumbling" -> qTumbling,
    "q_sliding" -> qSliding,
    "q_session" -> qSession,
    "q_dedup_events" -> qDedupEvents
  )

  private val bucket5m =
    "make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)"

  val oracle: Map[String, String] = Map(
    "q_tumbling" ->
      s"""SELECT $bucket5m AS w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,

    "q_sliding" ->
      s"""WITH base AS (
        |  SELECT $bucket5m AS b, event_type FROM events),
        |expanded AS (
        |  SELECT b AS w_start, event_type FROM base
        |  UNION ALL
        |  SELECT b - INTERVAL 5 MINUTE AS w_start, event_type FROM base)
        |SELECT w_start, event_type, COUNT(*) AS n
        |FROM expanded
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,

    "q_session" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            > INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS s_start,
        |  MAX(ts) + INTERVAL 10 MINUTE AS s_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    "q_dedup_events" ->
      """SELECT 2 * COUNT(*) AS n_before, COUNT(DISTINCT event_id) AS n_after
        |FROM events""".stripMargin
  )
}
