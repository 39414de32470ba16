package graft

/** The interactive DDL surface a HiveQL user drives daily — SHOW/DESCRIBE/
  * ALTER/TRUNCATE (reference capability: the HiveQL DDL surface deployed
  * by the charm's HiveServer2; smoke-test action runs exactly this family
  * via beeline). Qualified table names throughout — no `USE` — so the
  * shared test session's current database never changes. */
class DdlSpec extends SparkSpec {

  private val db = "graft_ddl_db"

  test("database + table lifecycle: SHOW, SHOW CREATE, ALTER, TRUNCATE") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      assert(spark.sql("SHOW DATABASES").collect()
        .map(_.getString(0)).contains(db))

      Tables.df(spark, sf, "region").write.mode("overwrite")
        .saveAsTable(s"$db.r1")
      assert(spark.sql(s"SHOW TABLES IN $db").collect()
        .map(_.getString(1)).contains("r1"))

      // SHOW CREATE TABLE reproduces the schema
      val ddl = spark.sql(s"SHOW CREATE TABLE $db.r1").head().getString(0)
      assert(ddl.contains("r_regionkey") && ddl.contains("r_name"), ddl)

      // schema evolution + rename
      spark.sql(s"ALTER TABLE $db.r1 ADD COLUMNS (note STRING)")
      assert(spark.table(s"$db.r1").columns.contains("note"))
      spark.sql(s"ALTER TABLE $db.r1 RENAME TO $db.r2")
      assert(spark.table(s"$db.r2").count() === 5)

      // EXPLAIN through the SQL surface
      val ex = spark.sql(s"EXPLAIN SELECT count(*) FROM $db.r2")
        .head().getString(0)
      assert(ex.contains("Physical Plan"), ex.take(200))

      spark.sql(s"TRUNCATE TABLE $db.r2")
      assert(spark.table(s"$db.r2").count() === 0)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("partitioned table exposes SHOW PARTITIONS and partition pruning DDL") {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      Tables.df(spark, sf, "nation").write.mode("overwrite")
        .partitionBy("n_regionkey").saveAsTable(s"$db.natp")
      val parts = spark.sql(s"SHOW PARTITIONS $db.natp").collect()
        .map(_.getString(0))
      assert(parts.length === 5 && parts.forall(_.startsWith("n_regionkey=")),
        parts.mkString(","))
      // partition metadata DDL: drop one partition, table shrinks
      spark.sql(s"ALTER TABLE $db.natp DROP PARTITION (n_regionkey = 0)")
      assert(spark.sql(s"SHOW PARTITIONS $db.natp").count() === 4)
      assert(spark.table(s"$db.natp")
        .filter("n_regionkey = 0").count() === 0)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
