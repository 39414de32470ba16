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
    val metrics = new BenchMetrics
    spark.sparkContext.addSparkListener(metrics)
    // rows-for-sanity count is OPT-IN (ADVICE r7): the untimed count used
    // to re-execute every query a second time per rep, which both doubles
    // the runtime and (for checkpoint-heavy queries) piles up cache blocks
    // that skew later reps
    val sanity = sys.env.get("SPARK_GRAFT_ROWS").contains("1")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- args; r <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      metrics.reset(spark.sparkContext)
      val t0 = System.nanoTime()
      // noop sink, same rationale as Bench: count() lets the optimizer
      // eliminate unread final joins/sorts and under-measure the query
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val snap = metrics.snapshot(spark.sparkContext)
      val rows = if (sanity) " rows=" + fn(spark, sfDir).count() else ""
      // same between-rep sweep as Bench (ADVICE r7): localCheckpoint
      // blocks from one rep otherwise tax the next rep's timing;
      // blocking so the removals don't leak into the next rep's window
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println("BENCHONE %s rep%d%s %s".format(name, r, rows, snap.json(sec)))
    }
    spark.stop()
  }
}
