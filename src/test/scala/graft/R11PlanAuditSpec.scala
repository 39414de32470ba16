package graft

import graft.queries.{Analytics, CurateOps, LearnOps, SketchOps, VectorQueries}

/** Plan-shape audits for the round-11 operators — the properties that
  * decide their 100 TB behavior: no accidental nested loops in the
  * winnowing pair join, a broadcast (not shuffled) spine under the
  * stickiness range join, pruned scans under the sketches, and the
  * brute-force Matryoshka pass staying one broadcast join. */
class R11PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("winnowing pair join is an equi-join on the fingerprint — never " +
      "a nested loop") {
    val plan = planOf(CurateOps.qDedupWinnow(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "winnow pairs must not cross-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "winnow pairs must not nested-loop")
  }

  test("stickiness range join broadcasts the day spine (a shuffled " +
      "nested loop over the activity relation would not scale)") {
    val plan = planOf(Analytics.qStickiness(spark, sf))
    // a non-equi range join plans as a nested loop — correct ONLY with
    // the |days|-row spine on the broadcast side
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ddsketch scan prunes to the single priced column") {
    val plan = planOf(SketchOps.qDdsketch(spark, sf))
    assert(plan.contains("o_totalprice"))
    assert(!plan.contains("o_orderdate") && !plan.contains("o_comment"),
      "sketch must not read unused order columns")
  }

  test("join-size estimation reads only the key/grouping columns") {
    val plan = planOf(SketchOps.qJoinCardest(spark, sf))
    assert(plan.contains("l_partkey") && plan.contains("p_size"))
    assert(!plan.contains("l_extendedprice") && !plan.contains("p_name"),
      "cardinality estimation must not read measure columns")
  }

  test("matryoshka pair pass is one broadcast join of the query decile") {
    // the registered query checkpoints the pair relation (hiding its
    // join from the final plan) — audit the pair stage directly
    val plan = planOf(VectorQueries.matryoshkaPairs(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"),
      "the corpus must never cartesian against itself")
  }

  test("auc ranks on the score-grouped relation: exactly one window " +
      "and it runs after an aggregate") {
    val df = LearnOps.qAuc(spark, sf)
    val plan = planOf(df)
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows == 1, s"expected 1 window pass, saw $windows")
  }
}
