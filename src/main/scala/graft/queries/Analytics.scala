package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite behavioral analytics over the events stream: conversion
  * funnel and cohort retention — multi-stage aggregation/join shapes that
  * exercise several operators together the way production queries do.
  * Both are key-partitioned all the way down (user_id / cohort-day), so
  * they scale like any hash-aggregate pipeline. */
object Analytics extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Signup → purchase conversion per user: first signup time, purchases
    * strictly after it, conversion flag. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.df(spark, sfDir, "events")
    val firstSignup = events.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(min($"ts").as("first_signup"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    firstSignup
      .join(purchases, $"user_id" === $"p_user" && $"p_ts" > $"first_signup",
        "left")
      .groupBy($"user_id", $"first_signup")
      .agg(count($"p_ts").as("n_purchases"),
        coalesce(sum(dec($"value")).cast("double"), lit(0.0)).as("spend"))
      .withColumn("converted", $"n_purchases" > 0)
      .orderBy($"user_id")
  }

  /** Daily cohort retention: users grouped by first-active day; for each
    * (cohort day, day offset) the number of distinct users active then. */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val activity = Tables.df(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val first = activity.groupBy($"user_id").agg(min($"d").as("fd"))
    activity.join(first, "user_id")
      .withColumn("day_offset", datediff($"d", $"fd"))
      .filter($"day_offset" <= 3)
      .groupBy($"fd", $"day_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"fd", $"day_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention
  )

  val oracle: Map[String, String] = Map(
    "q_funnel" ->
      """SELECT s.user_id, s.first_signup,
        |  COUNT(p.p_ts) AS n_purchases,
        |  COALESCE(CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        |    AS spend,
        |  COUNT(p.p_ts) > 0 AS converted
        |FROM (SELECT user_id, MIN(ts) AS first_signup FROM events
        |      WHERE event_type = 'signup' GROUP BY user_id) s
        |LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts, value FROM events
        |           WHERE event_type = 'purchase') p
        |  ON s.user_id = p.p_user AND p.p_ts > s.first_signup
        |GROUP BY s.user_id, s.first_signup
        |ORDER BY s.user_id""".stripMargin,

    "q_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |firstseen AS (
        |  SELECT user_id, MIN(d) AS fd FROM activity GROUP BY user_id)
        |SELECT f.fd, CAST(date_diff('day', f.fd, a.d) AS INT) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM activity a JOIN firstseen f USING (user_id)
        |WHERE date_diff('day', f.fd, a.d) <= 3
        |GROUP BY f.fd, day_offset
        |ORDER BY f.fd, day_offset""".stripMargin
  )
}
