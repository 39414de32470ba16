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
    * @return point rows joined to every interval containing them
    *         (half-open: start ≤ ts < end)
    */
  def bucketedRangeJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSecs: Long): DataFrame = {
    val pBucket = (unix_timestamp(col(tsCol)) / bucketSecs).cast("bigint")
    val p = points.withColumn("__bucket", pBucket)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        (unix_timestamp(col(startCol)) / bucketSecs).cast("bigint"),
        (unix_timestamp(col(endCol)) / bucketSecs).cast("bigint"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
