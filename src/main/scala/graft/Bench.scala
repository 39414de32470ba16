package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + parquet reader init on the smallest fixture,
    // so the first timed query doesn't absorb session warm-up costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => errors += name; -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: the f-interpolator is locale-sensitive, and a comma
    // decimal separator would make the line invalid JSON
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // A throwing query must not hide inside a green rc: surface names here.
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errs}""")
    // Short total-only line LAST: the driver parses the stdout tail, and the
    // full per-query line above can overflow its window at 88 queries.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"sf":"$sfDir","n_queries":${results.size},"errors":$errs}""")
    spark.stop()
  }
}
