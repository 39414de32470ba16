package graft

import graft.queries.{Corpus2Ops, Series2Ops, Vector2Ops}

/** Plan-shape audits for the round-15 operators whose 100 TB behavior
  * turns on a join strategy — asserted the way the R10–R14 audit specs
  * do, so a future regression is a spec failure, not a bench surprise. */
class R15PlanAuditSpec extends SparkSpec {

  test("ivf advisor: candidates meet in a (n_cells, cell) hash/merge " +
      "equi-join over the checkpointed distance relation — the config " +
      "fan-out never cartesians the corpus") {
    val p = Vector2Ops.qIvfAdvisor(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"),
      "the advisor must never cartesian the corpus: " + p.take(400))
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[n_cells#"""
      .r.findFirstIn(p).isDefined,
      "candidates must meet in a (n_cells, cell) equi-join: " +
        p.take(400))
    // the one corpus x 16 distance pass is checkpointed and serves
    // every config — no FileScan may survive below the config fan-out
    assert(p.contains("Scan ExistingRDD"),
      "the shared distance relation must be a checkpointed leaf")
  }

  test("js divergence / burrows delta: source pairs meet through a tok " +
      "equi-join on the vocabulary-thin spine — never an S x S nested " +
      "loop over token rows") {
    for ((name, df) <- Seq(
        "q_js_sources" -> Corpus2Ops.qJsSources(spark, sf),
        "q_burrows_delta" -> Corpus2Ops.qBurrowsDelta(spark, sf))) {
      val p = df.queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name must never cartesian: " + p.take(300))
      assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[tok#"""
        .r.findFirstIn(p).isDefined,
        s"$name pairs must meet in a tok equi-join: " + p.take(300))
    }
  }

  test("seasonal mk: within-stratum pairs meet in a dow equi-join with " +
      "the t-order predicate riding as a filter, never a full day " +
      "cross product") {
    val p = Series2Ops.seasonalMkPer(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"),
      "the pair stage must never cartesian: " + p.take(400))
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[dow#"""
      .r.findFirstIn(p).isDefined,
      "pairs must meet in a day-of-week equi-join: " + p.take(400))
  }
}
