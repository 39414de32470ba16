package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a named subset of `SparkEntry.queries` (all args are
  * query names; repeats each `SPARK_GRAFT_REPS` times, default 1). Mirrors
  * Bench's session config so numbers are comparable with the driver bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") // same default as Bench
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- args; r <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink, same rationale as Bench: count() lets the optimizer
      // eliminate unread final joins/sorts and under-measure the query
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = fn(spark, sfDir).count() // rows for sanity, untimed
      println("BENCHONE %s rep%d rows=%d sec=%s".format(name, r, n,
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))))
    }
    spark.stop()
  }
}
