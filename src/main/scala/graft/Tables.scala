package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference (`juju-solutions/layer-apache-hive`, a Juju charm that
  * deploys Apache Hive's metastore + HiveServer2) keeps table metadata in a
  * MySQL-backed metastore (reference `lib/charms/layer/bigtop_hive.py`,
  * `configure_hive`). Here the catalog role is played by Spark's in-memory
  * `SessionCatalog`: every fixture table is registered as a temp view so the
  * whole HiveQL-style SQL surface works against bare table names.
  *
  * Scale note: these are plain parquet scans — schema-on-read, no driver-side
  * materialization. On a real cluster the same code reads 100 TB fine because
  * nothing here collects; partitioning/pushdown is left to Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. */
  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all fixture tables as temp views (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
