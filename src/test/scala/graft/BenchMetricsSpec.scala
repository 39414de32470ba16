package graft

/** The telemetry listener is now part of the bench contract (PERF.md r8:
  * it is what makes an unreproducible driver wall number attributable),
  * so its own behavior is pinned: attribution windows must be exact
  * (flush-then-reset / flush-then-snapshot), counters must actually see
  * task work, and the JSON it emits must stay machine-parseable because
  * the driver's stdout tail is parsed as JSON.
  */
class BenchMetricsSpec extends SparkSpec {

  test("snapshot attributes task work to the window since reset") {
    val m = new BenchMetrics
    spark.sparkContext.addSparkListener(m)
    try {
      m.reset(spark.sparkContext)
      Tables.df(spark, sf, "lineitem")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      val snap = m.snapshot(spark.sparkContext)
      assert(snap.tasks > 0, "no tasks attributed to the query window")
      assert(snap.shufWrite > 0,
        "a groupBy materialization must write shuffle bytes")
      // a fresh window sees nothing: reset clears every counter AFTER
      // draining the bus, so the previous query cannot leak in
      m.reset(spark.sparkContext)
      val empty = m.snapshot(spark.sparkContext)
      assert(empty.tasks == 0 && empty.runMs == 0 && empty.shufWrite == 0,
        s"reset left residue: $empty")
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("snapshot JSON is valid JSON with the documented keys") {
    val snap = BenchMetrics.Snap(runMs = 1234, gcMs = 56, memSpill = 0,
      diskSpill = 0, peakExec = 5 << 20, shufRead = 1 << 20,
      shufWrite = 1 << 20, tasks = 7)
    val json = snap.json(wallSec = 1.5)
    // minimal structural parse without a JSON lib: balanced braces, all
    // keys present, no locale comma in numbers
    assert(json.startsWith("{") && json.endsWith("}"))
    for (k <- Seq("wall", "run", "gc", "spill_mb", "peak_mb", "shuf_mb",
        "tasks"))
      assert(json.contains("\"" + k + "\":"), s"missing key $k in $json")
    assert(json.contains("\"wall\":1.500") && json.contains("\"run\":1.234"),
      s"fixed-point formatting drifted: $json")
    assert(!json.contains("1,5"), "locale-sensitive decimal separator")
  }
}
