package graft

import graft.operators.AsOf
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
import org.apache.spark.sql.functions._

class NativeAsOfSpec extends SparkSpec {

  private def withStrategy[A](f: => A): A = {
    val prev = spark.experimental.extraStrategies
    try {
      spark.experimental.extraStrategies = prev :+ AsOfJoinStrategy
      f
    } finally spark.experimental.extraStrategies = prev
  }

  test("native as-of exec: strictly-prior, latest wins, null when none") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (2L, ts("2024-01-01 12:00:00"), 5L),
      (3L, ts("2024-01-01 09:00:00"), 6L)
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (ts("2024-01-01 09:30:00"), 5L, 100.0),
      (ts("2024-01-01 11:00:00"), 5L, 200.0),
      (ts("2024-01-01 12:00:00"), 5L, 300.0),
      (ts("2024-01-01 09:30:00"), 6L, 400.0)
    ).toDF("ts", "user_id", "value")
    withStrategy {
      val out = AsOfJoinPlan.asOfJoinNative(left, right, "user_id", "ts",
        Seq("value"))
      assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        "native exec node must be planned")
      val m = out.select($"event_id", $"prior_value").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(m(1L) === Some(100.0))
      assert(m(2L) === Some(200.0))
      assert(m(3L) === None)
    }
  }

  test("native exec agrees with the union+window composition on fixtures") {
    import spark.implicits._
    val events = Tables.df(spark, sf, "events")
    val purchases = events.filter($"event_type" === "purchase")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value")
    val composed = AsOf.asOfJoin(purchases, signups, "user_id", "ts",
      Seq("value"))
      .select($"event_id", $"prior_value")
      .orderBy($"event_id").collect().map(_.toString)
    val native = withStrategy {
      AsOfJoinPlan.asOfJoinNative(purchases, signups, "user_id", "ts",
        Seq("value"))
        .select($"event_id", $"prior_value")
        .orderBy($"event_id").collect().map(_.toString)
    }
    assert(native.length === composed.length)
    assert(native === composed)
  }

  test("native exec works with multiple payload columns and projection") {
    import spark.implicits._
    val events = Tables.df(spark, sf, "events")
    val left = events.filter($"event_type" === "click")
    val right = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value", $"event_id".as("view_id"))
    withStrategy {
      val out = AsOfJoinPlan.asOfJoinNative(left, right, "user_id", "ts",
        Seq("value", "view_id"))
      val rows = out.filter($"prior_view_id".isNotNull)
        .select($"event_id", $"prior_value", $"prior_view_id")
      assert(rows.count() > 0)
    }
  }
}
