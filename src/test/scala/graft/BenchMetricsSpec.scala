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
    // re-execution discriminators (VERDICT r9 #1) print ONLY when nonzero
    // — a healthy run must not spend stdout-tail budget on four zeros
    for (k <- Seq("failed", "retried", "stage_retry", "evict"))
      assert(!json.contains("\"" + k + "\""), s"zero-valued $k printed: $json")
    val anomalous = snap.copy(failed = 1, retried = 2, stageRetries = 3,
      evicted = 4).json(wallSec = 1.5)
    assert(anomalous.contains("\"failed\":1")
      && anomalous.contains("\"retried\":2")
      && anomalous.contains("\"stage_retry\":3")
      && anomalous.contains("\"evict\":4"),
      s"anomaly counters missing from $anomalous")
    assert(anomalous.endsWith("}") && !anomalous.contains(",,"),
      s"malformed JSON: $anomalous")
  }

  test("evicted counts store-reported removals, not explicit unpersist") {
    import org.apache.spark.SparkEnv
    import org.apache.spark.scheduler.SparkListenerBlockUpdated
    import org.apache.spark.storage.{BlockUpdatedInfo, BroadcastBlockId,
      RDDBlockId, StorageLevel}
    val m = new BenchMetrics
    spark.sparkContext.addSparkListener(m)
    try {
      // explicit unpersist must NOT count: the executor-side removeRdd
      // skips the master report, so the bench's own between-window
      // unpersist sweep stays invisible — only store-INITIATED drops
      // (memory-pressure evictions), which do report, reach the counter
      val df = Tables.df(spark, sf, "region").persist()
      df.count() // materialize the cached blocks
      m.reset(spark.sparkContext)
      df.unpersist(blocking = true)
      val clean = m.snapshot(spark.sparkContext)
      assert(clean.evicted == 0,
        s"explicit unpersist polluted the eviction counter: $clean")
      assert(clean.failed == 0 && clean.retried == 0
        && clean.stageRetries == 0, s"healthy run flagged anomalies: $clean")
      // a store-reported removal is an update to StorageLevel.NONE —
      // classify it directly (a genuine eviction needs memory pressure
      // this shared test session must not create)
      m.onBlockUpdated(SparkListenerBlockUpdated(new BlockUpdatedInfo(
        SparkEnv.get.blockManager.blockManagerId, RDDBlockId(1, 0),
        StorageLevel.NONE, 0L, 0L)))
      assert(m.snapshot(spark.sparkContext).evicted == 1,
        "StorageLevel.NONE block update not counted as eviction")
      // an update that KEEPS the block (e.g. drop-to-disk) is not removal
      m.onBlockUpdated(SparkListenerBlockUpdated(new BlockUpdatedInfo(
        SparkEnv.get.blockManager.blockManagerId, RDDBlockId(1, 1),
        StorageLevel.DISK_ONLY, 0L, 100L)))
      assert(m.snapshot(spark.sparkContext).evicted == 1,
        "a still-stored block update was miscounted as eviction")
      // broadcast-block removals are ContextCleaner hygiene (measured
      // 20-60 per query on healthy runs), NOT cache-eviction pressure
      m.onBlockUpdated(SparkListenerBlockUpdated(new BlockUpdatedInfo(
        SparkEnv.get.blockManager.blockManagerId, BroadcastBlockId(7L),
        StorageLevel.NONE, 0L, 0L)))
      assert(m.snapshot(spark.sparkContext).evicted == 1,
        "a broadcast-block removal was miscounted as eviction")
    } finally spark.sparkContext.removeSparkListener(m)
  }
}
