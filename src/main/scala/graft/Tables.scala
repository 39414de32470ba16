package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Read one fixture table.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType. We read nanos as raw longs
    * (legacy conf) and truncate to micros with integer division — the same
    * floor-truncation DuckDB applies when it reads nano timestamps into its
    * native microsecond TIMESTAMP, so oracle comparisons stay exact.
    */
  /** The session's shuffle-partition count — the pin value for the keyed
    * repartitions placed before wide fan-outs (the AQE-coalesce trap,
    * PERF.md). ADVICE r7: pinning to `defaultParallelism` only lets the
    * downstream window/join exchange reuse the partitioning when it
    * happens to equal `spark.sql.shuffle.partitions` (true under Bench's
    * local[cpus] config, not in general); pinning to the conf value keeps
    * it to one exchange in every session. */
  def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Deliberately session-sticky (plans are lazy; the conf must hold at
      // execution time, so save/restore here would break the frame): after
      // an events read, other TIMESTAMP(NANOS) parquet columns in this
      // session decode as raw longs too. The fixtures have exactly one
      // nanos column, so this is a documented non-issue here.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cast to NTZ so ts matches the other fixtures' timestamp-without-zone
      // semantics (and DuckDB's naive TIMESTAMP) when written back to parquet.
      // The fixture generation has shipped ts as both TIMESTAMP(NANOS)
      // (read as raw nano longs under the legacy conf) and plain
      // TIMESTAMP(MICROS); branch on the decoded type so either works.
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
        case _ => col("ts").cast("timestamp_ntz")
      }
      raw.withColumn("ts", tsCol)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register all fixture tables as temp views (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
