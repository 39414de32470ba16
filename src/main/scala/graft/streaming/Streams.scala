package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time stream processing — the extension surface the reference's
  * Hive 1.2 deployment lacks entirely (Hive has only an ACID ingest API;
  * its time-series queries are plain tables). Built on Structured
  * Streaming semantics: every transform here is expressed as
  * DataFrame → DataFrame so the SAME code runs in batch (where the DuckDB
  * oracle can check it) and behind `readStream` (where watermarks engage).
  *
  * Scale note: windowed aggregations shuffle on (window, key) — bounded
  * state per key×window; session windows keep per-key state bounded by the
  * watermark horizon. Nothing here holds unbounded state.
  */
object Streams {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Tumbling event-time windows per event_type. */
  def tumblingCounts(events: DataFrame, width: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(window($"ts", width).as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select($"w.start".as("w_start"), $"event_type", $"n", $"sum_value")
  }

  /** Sliding windows (each event lands in width/slide windows). */
  def slidingCounts(events: DataFrame, width: String, slide: String)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(window($"ts", width, slide).as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"event_type", $"n")
  }

  /** Session windows per user: a session closes after `gap` of silence.
    * (Batch twin of the streaming sessionization; state per live session
    * only.) */
  def sessionize(events: DataFrame, gap: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select($"user_id", $"w.start".as("s_start"), $"w.end".as("s_end"),
        $"n_events", $"sum_value")
  }

  /** Streaming-mode wrapper: event-time watermark + tumbling aggregation —
    * late rows beyond `lateness` are dropped and state is reclaimed. */
  def tumblingWithWatermark(stream: DataFrame, width: String,
      lateness: String): DataFrame =
    tumblingCounts(stream.withWatermark("ts", lateness), width)

  /** Streaming dedup bounded by the watermark horizon. */
  def dedupWithinWatermark(stream: DataFrame, lateness: String): DataFrame =
    stream.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")
}
