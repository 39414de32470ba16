package graft.sources

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ACID DML (UPDATE / DELETE / MERGE) as copy-on-write table rewrites —
  * the semantics of Hive's transactional tables (reference loci:
  * ql/parse/UpdateDeleteSemanticAnalyzer, MergeSemanticAnalyzer)
  * re-expressed the way Spark-native table formats do it: read the
  * affected files, apply the mutation relationally, write new files, swap.
  * Hive's own ACID implementation is delta files + compaction; plain
  * parquet has no delta layer, so copy-on-write is the honest equivalent
  * (it is exactly what Delta/Iceberg COW mode executes under MERGE).
  *
  * Scale notes: the rewrite is a distributed read→transform→write, never a
  * driver-side materialization. On a partitioned table the pattern
  * rewrites only partitions containing matches (partition-prune the read,
  * keep untouched partitions by reference); this single-directory
  * implementation rewrites the whole table, which is the correct shape at
  * fixture scale and documents where partition pruning slots in. The swap
  * is write-to-temp + directory rename, so a failed job never leaves a
  * half-written table.
  */
object Acid {

  /** Rewrite `tablePath` through `transform`, via a temp dir + swap. The
    * old table is parked as a backup until the new directory is in place,
    * so an in-process rename failure rolls back. Honest limits of a
    * filesystem swap (no atomic directory rename on HDFS/S3): a hard crash
    * between the two renames leaves the data recoverable in
    * `<path>__cow_bak` but needs a manual move back, and a concurrent
    * reader can observe the table missing for the instant between renames
    * — table formats (Delta/Iceberg) solve both with a metadata pointer,
    * which is out of scope for plain parquet. */
  private def rewrite(spark: SparkSession, tablePath: String)(
      transform: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val table = new Path(tablePath)
    val tmp = new Path(tablePath.stripSuffix("/") + "__cow_tmp")
    val bak = new Path(tablePath.stripSuffix("/") + "__cow_bak")
    transform(spark.read.parquet(tablePath))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(bak, true)
    if (!fs.rename(table, bak))
      throw new java.io.IOException(s"could not park $table for swap")
    if (!fs.rename(tmp, table)) {
      fs.rename(bak, table) // roll back
      throw new java.io.IOException(s"could not swap $tmp into $table")
    }
    fs.delete(bak, true)
  }

  /** UPDATE tablePath SET assignments WHERE cond. One projection, so the
    * condition and every RHS see the ORIGINAL row (SQL semantics) — a
    * sequential withColumn chain would let later assignments observe
    * already-updated values. */
  def update(spark: SparkSession, tablePath: String, cond: Column,
      assignments: Map[String, Column]): Unit =
    rewrite(spark, tablePath) { df =>
      df.select(df.columns.map { c =>
        assignments.get(c)
          .map(v => when(cond, v).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*)
    }

  /** DELETE FROM tablePath WHERE cond (NULL condition keeps the row, as in
    * SQL: only rows where cond IS TRUE are deleted). */
  def delete(spark: SparkSession, tablePath: String, cond: Column): Unit =
    rewrite(spark, tablePath)(_.filter(!coalesce(cond, lit(false))))

  /** MERGE INTO tablePath USING source ON key:
    * matched rows take the source's values (WHEN MATCHED THEN UPDATE SET *),
    * unmatched source rows are inserted (WHEN NOT MATCHED THEN INSERT *),
    * unmatched target rows are kept — one full-outer join on the key, one
    * shuffle. Source must have the target's columns. SQL MERGE's
    * cardinality rule — no TARGET row may match more than one source
    * row — is enforced at runtime (the job fails rather than picking a
    * winner nondeterministically); duplicate source keys that match
    * nothing are all inserted, as the standard prescribes. */
  def mergeInto(spark: SparkSession, tablePath: String, source: DataFrame,
      keyCols: Seq[String]): Unit =
    rewrite(spark, tablePath) { target =>
      val cols = target.columns.toSeq
      val valCols = cols.filterNot(keyCols.contains)
      // cast source to the TARGET's exact types: otherwise the using-join
      // takes the common wider type and a row-level MERGE silently rewrites
      // the table with a changed schema (e.g. int32 key widened to int64)
      val src = source.select(target.schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        .withColumn("__dup",
          count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      val t = target.select(keyCols.map(col) ++
        valCols.map(c => col(c).as(s"__t_$c")) :+
        lit(true).as("__t_exists"): _*)
      // explicit matched-marker, NOT per-column coalesce: a matched source
      // row must win even where its value is legitimately NULL (UPDATE SET
      // col = NULL), and coalesce would silently keep the target's value
      val s = src.select(keyCols.map(col) ++
        valCols.map(c => col(c).as(s"__s_$c")) :+
        lit(true).as("__matched") :+ col("__dup"): _*)
      // the cardinality assert rides on a projected output column so
      // column pruning cannot drop it (the first value column, or the
      // first key for a keys-only table); assert_true is NULL (isNull =
      // true) on success and aborts the job on violation — only MATCHED
      // duplicates (__t_exists set) violate the rule
      val guard = assert_true(
        coalesce(col("__dup"), lit(1L)) <= 1 || col("__t_exists").isNull,
        lit("MERGE matched a target row with multiple source rows"))
      val guardCol = valCols.headOption.getOrElse(keyCols.head)
      t.join(s, keyCols, "full_outer")
        .select(cols.map { c =>
          val v =
            if (keyCols.contains(c)) col(c)
            else when(col("__matched") === true, col(s"__s_$c"))
              .otherwise(col(s"__t_$c"))
          if (c == guardCol) when(guard.isNull, v).as(c) else v.as(c)
        }: _*)
    }
}
