package graft

import graft.queries.Functions
import org.apache.spark.sql.functions._

/** Assertions for the functions whose semantics the DuckDB oracle cannot
  * mirror (q_misc_pack is rows-only in the driver gate). */
class MiscFunctionsSpec extends SparkSpec {

  test("misc pack values: soundex, xpath, hashes, input file") {
    import spark.implicits._
    val rows = Functions.qMiscPack(spark, sf).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[String]("sdx").matches("[A-Z][0-9]{3}"))
    assert(r.getAs[String]("xp") === r.getAs[Long]("c_custkey").toString)
    assert(r.getAs[String]("sh1").matches("[0-9a-f]{40}"))
    assert(r.getAs[String]("src_file").contains("customer"))
  }

  test("misc sql half values: conv, parse_url, months_between") {
    import spark.implicits._
    val rows = Functions.qMiscSql(spark, sf).collect()
    assert(rows.nonEmpty)
    val r = rows.head
    // conv: base-16 of the key
    assert(java.lang.Long.parseLong(r.getAs[String]("cv"), 16)
      === r.getAs[Long]("c_custkey"))
    assert(r.getAs[String]("host") === "example.com")
    assert(r.getAs[String]("qid") === r.getAs[Long]("c_custkey").toString)
    assert(r.getAs[Double]("mb") === 5.0)
  }

  test("native SQL TRANSFORM ... USING '/bin/cat' round-trips rows") {
    // §2.9 script operator, NATIVE syntax (not only the mapPartitions
    // substitute): Spark's no-serde TRANSFORM mode pipes delimited rows
    // through the script's stdin/stdout, no Hive support needed
    import spark.implicits._
    Tables.df(spark, sf, "nation").createOrReplaceTempView("nation_xf")
    val out = spark.sql(
      """SELECT TRANSFORM(n_nationkey, n_name)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |  USING '/bin/cat'
        |  AS (k STRING, name STRING)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |FROM nation_xf""".stripMargin)
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = Tables.df(spark, sf, "nation")
      .select($"n_nationkey".cast("string"), $"n_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want, s"TRANSFORM round-trip lost rows: got ${got.size}")
  }

  test("str_to_map and sentences structure") {
    import spark.implicits._
    val df = Seq("a:1,b:2").toDF("s")
      .select(str_to_map($"s", lit(","), lit(":")).as("m"),
        sentences(lit("Hello world. Second one.")).as("sn"))
    val r = df.head()
    assert(r.getAs[Map[String, String]]("m") === Map("a" -> "1", "b" -> "2"))
    val sn = r.getSeq[scala.collection.Seq[String]](1)
    assert(sn.length === 2 && sn.head === Seq("Hello", "world"))
  }

  test("seeded tablesample is reproducible and roughly proportional") {
    import spark.implicits._
    val li = Tables.df(spark, sf, "lineitem")
    def sampled() = li.sample(withReplacement = false, 0.1, 42L).count()
    val n1 = sampled(); val n2 = sampled()
    assert(n1 === n2, "same seed must give the same sample")
    val total = li.count()
    assert(n1 > total * 0.05 && n1 < total * 0.15)
  }

  test("next_day lands on the requested weekday strictly after the input") {
    import spark.implicits._
    val d = Seq("2024-01-01").toDF("d") // a Monday
      .select(next_day(to_date($"d"), "Mon").as("nd")).head()
      .getAs[java.sql.Date]("nd")
    assert(d.toString === "2024-01-08")
  }
}
