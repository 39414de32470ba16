package graft

import graft.queries.Stats2Ops

/** Plan-shape audits for the two r15 bounded-pair statistics ops whose
  * 100 TB safety turns on the pair/replicate relation being built from
  * the DAY-GRAIN checkpoint (VERDICT r15 #4): the (n/2)² HL pair cross
  * product and the 16-replicate bootstrap fan-out are calendar-bounded
  * ONLY because their scan leaves are the checkpointed daily series —
  * if a refactor re-derived them from a data-grain source (events rows),
  * the same plan shape would be corpus² instead of days². Asserted the
  * way R10–R15's audits are, so the regression is a spec failure. */
class R16PlanAuditSpec extends SparkSpec {

  test("hl shift: the pairwise-difference relation is built from the " +
      "day-grain checkpoint — every scan leaf is an ExistingRDD, never " +
      "a data-grain file scan under the pair cross product") {
    val p = Stats2Ops.qHlShift(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("FileScan"),
      "the pair stage must read the checkpointed day relation, not a " +
        "data-grain source: " + p.take(400))
    assert(p.contains("Scan ExistingRDD"),
      "the day-grain localCheckpoint must be the scan leaf: " +
        p.take(400))
  }

  test("boot compare: both bootstrap arms fan out over the day-grain " +
      "checkpoint — every scan leaf is an ExistingRDD, never a " +
      "data-grain file scan under the replicate explode") {
    val p = Stats2Ops.qBootCompare(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("FileScan"),
      "the replicate relations must read the checkpointed day " +
        "relation, not a data-grain source: " + p.take(400))
    assert(p.contains("Scan ExistingRDD"),
      "the day-grain localCheckpoint must be the scan leaf: " +
        p.take(400))
  }
}
