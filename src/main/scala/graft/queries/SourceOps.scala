package graft.queries

import graft.Tables
import graft.sources.Sources
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Writer-path operators exercised inside the correctness gate: a dynamic
  * partitioned write, read back through partition pruning, aggregated and
  * hash-checked against the oracle over the ORIGINAL table — proving the
  * write→prune→read path is lossless. */
object SourceOps extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  def qPartitionedRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_part_orders"
    Sources.writePartitioned(
      Tables.df(spark, sfDir, "orders"), tmp, "o_orderstatus")
    Sources.readPartitioned(spark, tmp)
      .filter($"o_orderstatus" === "F") // prunes to the F directory
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec($"o_totalprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partitioned_roundtrip" -> qPartitionedRoundtrip
  )

  val oracle: Map[String, String] = Map(
    "q_partitioned_roundtrip" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
