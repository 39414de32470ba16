package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed `Aggregator` — the Spark-native counterpart of
  * Hive's custom-UDAF extension API (GenericUDAFResolver2), demonstrating
  * the user-defined aggregate surface. Algebraic (sum of logs + count), so
  * it gets map-side partial aggregation and shuffles O(1) state per group —
  * 100 TB-safe like any built-in agg.
  */
case class GeoMeanBuf(var sumLog: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    if (x > 0) { b.sumLog += math.log(x); b.n += 1 }
    b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf = {
    a.sumLog += b.sumLog; a.n += b.n; a
  }
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register as SQL/expr-callable `geomean(double)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("geomean", udaf(GeoMean))
}
