package graft

import graft.sources.Acid
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Copy-on-write DML semantics: UPDATE/DELETE/MERGE rewrite the table
  * correctly and MERGE enforces SQL's source-cardinality rule. */
class AcidSpec extends SparkSpec {

  private def seed(name: String): String = {
    val path = Files.createTempDirectory(name).toString
    Tables.df(spark, sf, "nation").write.mode("overwrite").parquet(path)
    path
  }

  test("UPDATE rewrites matching rows in place") {
    import spark.implicits._
    val path = seed("acid_upd")
    Acid.update(spark, path, $"n_regionkey" === 0,
      Map("n_name" -> lit("REDACTED")))
    val after = spark.read.parquet(path)
    val inRegion = after.filter($"n_regionkey" === 0)
    assert(inRegion.count() > 0)
    assert(inRegion.filter($"n_name" =!= "REDACTED").count() === 0)
    assert(after.filter($"n_regionkey" =!= 0)
      .filter($"n_name" === "REDACTED").count() === 0)
    assert(after.count() === Tables.df(spark, sf, "nation").count())
  }

  test("DELETE removes exactly the matching rows") {
    import spark.implicits._
    val path = seed("acid_del")
    val before = spark.read.parquet(path).count()
    val hit = spark.read.parquet(path).filter($"n_regionkey" === 2).count()
    Acid.delete(spark, path, $"n_regionkey" === 2)
    val after = spark.read.parquet(path)
    assert(after.count() === before - hit)
    assert(after.filter($"n_regionkey" === 2).count() === 0)
  }

  test("MERGE updates matched, inserts unmatched, keeps the rest") {
    import spark.implicits._
    val path = seed("acid_merge")
    val source = Seq(
      (0L, "ALGERIA-2", 9L, "updated row"),   // matches nationkey 0
      (99L, "ATLANTIS", 9L, "inserted row")   // new key
    ).toDF("n_nationkey", "n_name", "n_regionkey", "n_comment")
    Acid.mergeInto(spark, path, source, Seq("n_nationkey"))
    val after = spark.read.parquet(path)
    assert(after.count() === Tables.df(spark, sf, "nation").count() + 1)
    assert(after.filter($"n_nationkey" === 0).head().getString(1)
      === "ALGERIA-2")
    assert(after.filter($"n_nationkey" === 99).head().getString(1)
      === "ATLANTIS")
    // an untouched row is byte-identical
    assert(after.filter($"n_nationkey" === 5).collect().toSeq ===
      Tables.df(spark, sf, "nation")
        .filter($"n_nationkey" === 5).collect().toSeq)
  }

  test("MERGE writes a NULL source value over a non-null target value") {
    import spark.implicits._
    val path = seed("acid_merge_null")
    val source = Seq((0L, null.asInstanceOf[String], 9L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    Acid.mergeInto(spark, path, source, Seq("n_nationkey"))
    val r = spark.read.parquet(path).filter($"n_nationkey" === 0).head()
    assert(r.isNullAt(r.fieldIndex("n_name")),
      "matched source NULL must overwrite, not fall back to the target")
    // the merge preserves the table's original column types (int stays int)
    assert(r.getAs[Number]("n_regionkey").longValue === 9L)
  }

  test("MERGE inserts duplicate UNMATCHED source keys (standard semantics)") {
    import spark.implicits._
    val path = seed("acid_merge_dup_ins")
    val before = spark.read.parquet(path).count()
    val dupInserts = Seq(
      (98L, "ATLANTIS-A", 9L), (98L, "ATLANTIS-B", 9L) // match nothing
    ).toDF("n_nationkey", "n_name", "n_regionkey")
    Acid.mergeInto(spark, path, dupInserts, Seq("n_nationkey"))
    val after = spark.read.parquet(path)
    assert(after.count() === before + 2,
      "unmatched duplicate source keys must all insert")
    assert(after.filter($"n_nationkey" === 98).count() === 2)
  }

  test("MERGE rejects a source with duplicate keys") {
    import spark.implicits._
    val path = seed("acid_merge_dup")
    val dup = Seq(
      (0L, "A", 9L, "x"), (0L, "B", 9L, "y")
    ).toDF("n_nationkey", "n_name", "n_regionkey", "n_comment")
    val e = intercept[Exception] {
      Acid.mergeInto(spark, path, dup, Seq("n_nationkey"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("multiple source rows")), e.toString)
  }
}
