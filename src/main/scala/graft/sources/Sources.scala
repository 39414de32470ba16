package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface — the I/O side of the deployed Hive engine
  * (reference loci: FileSinkOperator for INSERT, LoadSemanticAnalyzer for
  * LOAD DATA, SerDe family for TEXTFILE/CSV/JSON, ql/io/orc + parquet for
  * columnar): re-expressed as DataFrameReader/Writer round-trips.
  *
  * Environment notes (documented unsupported, as SURVEY §7.3):
  *  - RCFile / SequenceFile readers: no Spark-native reader; out of scope.
  *  - Avro: the `spark-avro` datasource jar is not in /opt/spark/jars, so
  *    `format("avro")` cannot load here; code path would be identical.
  *  - ACID UPDATE/DELETE/MERGE, EXPORT/IMPORT, Hive indexes: out of scope.
  *
  * Scale notes: partitioned writes encode the partition key in directory
  * paths (same layout Hive uses), so reads with a partition predicate list
  * only matching directories (partition pruning — verified in tests via
  * PartitionFilters in the plan). Bucketed tables pre-shuffle once at write
  * time and let equal-bucketed joins skip the shuffle entirely (SMB join).
  */
object Sources {

  /** INSERT OVERWRITE ... PARTITION (dynamic): directory-partitioned
    * parquet write. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Read a partitioned table back; predicates on partition columns prune
    * directories instead of reading data. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Generic write+read round-trip for row formats (csv/json/text/orc/
    * parquet). `options` apply to both sides (e.g. header/sep for csv). */
  def roundTrip(df: DataFrame, path: String, format: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    df.write.mode(SaveMode.Overwrite).options(options).format(format)
      .save(path)
    val r = df.sparkSession.read.options(options).format(format)
    // csv/json are schemaless on disk: re-apply the source schema so types
    // survive the round-trip (Hive would get this from the metastore)
    (if (format == "csv" || format == "json") r.schema(df.schema) else r)
      .load(path)
  }

  /** LOAD DATA INPATH analog (reference locus: ql/parse/
    * LoadSemanticAnalyzer): files are MOVED into the table/partition
    * directory — never parsed, converted, or rewritten — and the table sees
    * them on the next read. `OVERWRITE` clears the destination first.
    * Hidden/marker files (`_SUCCESS`, dotfiles) stay behind, as Hive's
    * loader skips them. Pure metadata-speed at any scale: a rename per
    * file, no data pass. */
  def loadDataInpath(spark: SparkSession, srcDir: String, tableDir: String,
      partition: Seq[(String, String)] = Nil,
      overwrite: Boolean = true): Unit = {
    import org.apache.hadoop.fs.Path
    val src = new Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(partition.foldLeft(tableDir) {
      case (p, (k, v)) => s"$p/$k=$v"
    })
    if (overwrite && fs.exists(dest)) fs.delete(dest, true)
    fs.mkdirs(dest)
    fs.listStatus(src)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach(st => fs.rename(st.getPath, new Path(dest, st.getPath.getName)))
  }

  /** CREATE TABLE AS SELECT into the session catalog. */
  def ctas(spark: SparkSession, table: String, sql: String): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING parquet AS $sql")
    spark.table(table)
  }

  /** Hive multi-insert (`FROM src INSERT ... INSERT ...`): one materialized
    * scan fanned out to several sinks — the scan runs once, not per sink. */
  def multiInsert(src: DataFrame,
      sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    val cached = src.persist()
    try sinks.foreach { case (transform, path) =>
      transform(cached).write.mode(SaveMode.Overwrite).parquet(path)
    }
    finally cached.unpersist()
  }

  /** CLUSTERED BY (col) SORTED BY (col) INTO n BUCKETS: bucketed + sorted
    * managed table. Equal-bucketed equi-joins skip the shuffle (Hive's SMB
    * join) — asserted in SourcesSpec by the absence of Exchange. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", s"${System.getProperty("java.io.tmpdir")}/graft_$table")
      .saveAsTable(table)
  }
}
