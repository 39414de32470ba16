package graft

import graft.queries.GraphOps

/** Plan-shape audits for the two heaviest un-audited graph operators
  * (VERDICT r14 #4): q_label_prop and q_modularity both ride the
  * synchronous LPA loop, which is now checkpoint-linearized like k-core
  * and the landmark BFS — these specs pin the per-round constant shape
  * so the next co-tenancy drift on either query is dismissible by spec
  * (identical plan ⇒ machine, not plan growth). */
class R14PlanAuditSpec extends SparkSpec {

  test("label propagation: per-round plans are a constant-size " +
      "edges⋈labels equi-join + two-level agg over checkpointed leaves") {
    val edges = GraphOps.coPurchaseEdges(spark, sf).localCheckpoint()
    val (rounds, finalLabels) = GraphOps.lpaRounds(edges, 2)
    assert(rounds.size == 2)
    val exchangeCounts = rounds.map { r =>
      val p = r.queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "an LPA round must never nested-loop: " + p.take(300))
      // the 2^rounds failure mode: round N embedding round N-1's join
      // tree instead of reading its checkpointed RDD
      assert(!p.contains("FileScan") && p.contains("Scan ExistingRDD"),
        "every round input must be a checkpointed relation: " +
          p.take(300))
      assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"""
        .r.findFirstIn(p).isDefined,
        "labels must meet the edges in a hash/merge equi-join: " +
          p.take(300))
      "Exchange hashpartitioning".r.findAllIn(p).size
    }
    assert(exchangeCounts.distinct.size == 1,
      s"per-round Exchange counts must match: " +
        exchangeCounts.mkString(","))
    // the final labels come back checkpointed — the multi-consumer
    // tails (sizes join / modularity's two label joins) must not
    // recompute the rounds
    val fp = finalLabels.queryExecution.sparkPlan.toString
    assert(fp.contains("Scan ExistingRDD") && !fp.contains("FileScan"),
      "lpaLoop's result must be the checkpointed relation: " +
        fp.take(300))
  }

  test("modularity: intra-edge and degree stages are label equi-joins; " +
      "the only nested-loop is the documented 1-row 2m broadcast") {
    val p = GraphOps.qModularity(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"),
      "modularity must never cartesian: " + p.take(400))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1,
      s"only the 1-row edge-count broadcast may nested-loop " +
        s"(found $bnlj): " + p.take(400))
    // both label joins and the community aggregates are hash/merge
    // equi-joins over the checkpointed edge/label relations
    assert(!p.contains("FileScan"),
      "every leaf must be a checkpointed relation: " + p.take(400))
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"""
      .r.findFirstIn(p).isDefined,
      "labels must meet the edges in equi-joins: " + p.take(400))
  }

  test("label propagation result is unchanged by the linearization " +
      "(bipartite collapse: two communities, Q = -0.5 preserved)") {
    val mod = GraphOps.qModularity(spark, sf).collect()
    assert(mod.length == 2, "bipartite LPA must collapse to the 2 sides")
    val q = mod.map(_.getDouble(4)).sum
    assert(math.abs(q - (-0.5)) < 1e-6,
      s"total modularity must stay exactly -0.5, got $q")
  }
}
