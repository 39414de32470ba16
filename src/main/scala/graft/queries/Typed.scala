package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed `Dataset[T]` surface (SURVEY §1.3): case-class Encoders,
  * `groupByKey` → `KeyValueGroupedDataset`, and typed `Aggregator`s applied
  * as TypedColumns. HiveQL itself is untyped, so this is the Spark-native
  * bonus tier — compile-time row shapes for pipeline code. Typed aggs
  * compile to the same partial/final HashAggregate as the untyped API. */
object Typed extends QueryPack {

  case class Line(l_returnflag: String, l_linestatus: String,
      l_quantity: Double, l_extendedprice: Double)

  /** Typed sum aggregator (the Aggregator-as-TypedColumn shape). */
  object QtySum extends Aggregator[Line, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, l: Line): Double = b + l.l_quantity
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed pipeline: Dataset[Line] → groupByKey → typed agg + count.
    * l_quantity values are integral, so the double sum is exact and
    * order-independent (hash-oracle safe without a decimal detour). */
  def qTypedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.df(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice")
      .as[Line]
    ds.groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .agg(QtySum.toColumn.name("sum_qty"))
      .map { case ((flag, status), sumQty) => (flag, status, sumQty) }
      .toDF("l_returnflag", "l_linestatus", "sum_qty")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_agg" -> qTypedAgg
  )

  val oracle: Map[String, String] = Map(
    "q_typed_agg" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
