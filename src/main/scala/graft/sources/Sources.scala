package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface — the I/O side of the deployed Hive engine
  * (reference loci: FileSinkOperator for INSERT, LoadSemanticAnalyzer for
  * LOAD DATA, SerDe family for TEXTFILE/CSV/JSON, ql/io/orc + parquet for
  * columnar): re-expressed as DataFrameReader/Writer round-trips.
  *
  * Implemented here: TEXTFILE/CSV/JSON/ORC/parquet round-trips, partitioned
  * and bucketed writes, SEQUENCEFILE ([[sequenceFileRoundTrip]]), LOAD DATA
  * [LOCAL] INPATH, multi-insert, CTAS, EXPORT/IMPORT with a schema bundle;
  * ACID UPDATE/DELETE/MERGE live in [[Acid]].
  *
  * Environment notes (documented unsupported, as SURVEY §7.3 and README):
  *  - RCFile: no Spark-native reader; out of scope permanently.
  *  - Avro: the `spark-avro` datasource jar is not in /opt/spark/jars, so
  *    `format("avro")` cannot load here; with that one jar on the
  *    classpath the identical roundTrip("avro") path would work unchanged.
  *  - Hive indexes: dropped upstream in Hive 3; out of scope.
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

  /** SEQUENCEFILE round-trip — the one Hive storage format with no Spark
    * SQL datasource; Hive stores a text table in SequenceFile as
    * (ignored key, Text line) records, which the RDD API reads/writes
    * natively (this is the documented "genuine per-partition imperative
    * logic" case for dropping below DataFrames). `df` must be a single
    * NON-NULL string column (Hive's text layout has no null marker);
    * returns the re-read lines with the same column name. Overwrites
    * `path` like every other writer here. */
  def sequenceFileRoundTrip(df: DataFrame, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.io.{NullWritable, Text}
    val spark = df.sparkSession
    import spark.implicits._
    val colName = df.columns.head
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true) // saveAsSequenceFile refuses to
    df.rdd.map(r => (NullWritable.get(), new Text(r.getString(0))))
      .saveAsSequenceFile(path)
    spark.sparkContext
      .sequenceFile(path, classOf[NullWritable], classOf[Text])
      .map(_._2.toString)
      .toDF(colName)
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
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val srcFs = src.getFileSystem(conf)
    val dest = new Path(partition.foldLeft(tableDir) {
      case (p, (k, v)) => s"$p/$k=$v"
    })
    val destFs = dest.getFileSystem(conf)
    if (overwrite && destFs.exists(dest)) destFs.delete(dest, true)
    destFs.mkdirs(dest)
    srcFs.listStatus(src)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach { st =>
        val to = new Path(dest, st.getPath.getName)
        // rename is per-filesystem; across filesystems (local → HDFS, the
        // LOCAL INPATH case) fall back to copy+delete, exactly as Hive's
        // loader does. Per-file like Hive: a mid-load failure leaves a
        // partial load (LOAD DATA has never been transactional).
        val moved = (srcFs eq destFs) && srcFs.rename(st.getPath, to)
        if (!moved &&
            !FileUtil.copy(srcFs, st.getPath, destFs, to, true, true, conf))
          throw new java.io.IOException(
            s"LOAD DATA could not move ${st.getPath} into $dest")
      }
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

  /** EXPORT TABLE analog (reference locus: ql/parse/Export/
    * ImportSemanticAnalyzer): data files plus a `_metadata.json` carrying
    * the schema — the metastore half of Hive's export bundle — so an
    * import on another warehouse recreates the table without guessing
    * types. */
  def exportTable(spark: SparkSession, table: String, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val df = spark.table(table)
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dir/_metadata.json"), true)
    try out.write(df.schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** IMPORT TABLE analog: re-create `newTable` in the catalog from an
    * export bundle, types restored from the bundled schema. */
  def importTable(spark: SparkSession, newTable: String, dir: String)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.types.{DataType, StructType}
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$dir/_metadata.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val schema = DataType.fromJson(json).asInstanceOf[StructType]
    spark.sql(s"DROP TABLE IF EXISTS $newTable")
    spark.read.schema(schema).parquet(s"$dir/data")
      .write.saveAsTable(newTable)
    spark.table(newTable)
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
