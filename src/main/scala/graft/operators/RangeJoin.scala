package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point events to [start, end) intervals.
  * A naive `l.ts BETWEEN r.start AND r.end` theta join has no equi key, so
  * Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) and a 100 TB
  * anti-pattern unless one side is tiny.
  *
  * The scale formulation here is bucketed expansion: quantize time into
  * fixed-width buckets, explode each interval to the buckets it covers,
  * equi-join on the bucket id, then apply the exact range predicate as a
  * residual filter. Cost: one hash shuffle on bucket id; row expansion is
  * interval_span/bucket_width per interval — pick the width near the median
  * interval length. (Same trick Flink/KDB interval joins use internally.)
  */
object RangeJoin {

  /** @param points     DataFrame with a timestamp column `tsCol`
    * @param intervals  DataFrame with `startCol`/`endCol` timestamps
    * @param bucketSecs bucket width in seconds
    * @param maxSpanBuckets data-quality guard: an interval spanning more
    *        buckets than this (an open-ended sentinel date, a corrupt end
    *        timestamp) aborts the job instead of materializing a
    *        multi-million-element explode array
    * @return point rows joined to every interval containing them
    *         (half-open: start ≤ ts < end)
    */
  def bucketedRangeJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSecs: Long, maxSpanBuckets: Long = 100000L): DataFrame = {
    val pBucket = (unix_timestamp(col(tsCol)) / bucketSecs).cast("bigint")
    val p = points.withColumn("__bucket", pBucket)
    val b0 = (unix_timestamp(col(startCol)) / bucketSecs).cast("bigint")
    val b1 = (unix_timestamp(col(endCol)) / bucketSecs).cast("bigint")
    val iv = intervals
      .withColumn("__span_ok", assert_true(b1 - b0 <= maxSpanBuckets,
        lit(s"interval spans more than $maxSpanBuckets buckets — " +
          "corrupt end timestamp or bucketSecs far too small")))
      .withColumn("__bucket",
        explode(when(col("__span_ok").isNull, sequence(b0, b1))))
      .drop("__span_ok")
    p.join(iv, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
