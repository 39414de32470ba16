package graft

import graft.queries.GraphOps
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Plan-shape audits for the round-12 heavy graph operators (VERDICT r12
  * #3) — the structural properties that decide their 100 TB behavior,
  * asserted the way the r10/r11 audit specs do: the Adamic–Adar wedge
  * must be an equi-join with the hub cap applied BELOW it, and the
  * k-core peel must not re-plan prior rounds (the 2^depth lineage
  * blow-up the per-round checkpoints exist to prevent). */
class R12PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("adamic-adar wedge is an equi-join on the part key with the hub " +
      "cap filtered below it — never a nested loop") {
    val plan = planOf(GraphOps.qAdamicAdar(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the wedge must never nested-loop: " + plan.take(400))
    // the c1<c2 ordering predicate must be a post-join filter on an
    // equi-join keyed by the witness part, not a theta-join condition
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[p#""".r
      .findFirstIn(plan).isDefined,
      "wedge join must be keyed on p: " + plan.take(400))
    // hub cap (2 <= deg <= 100) sits under the join: the degree filter
    // prunes parts BEFORE any wedge fan-out exists
    assert("""pd#\d+L? >= 2""".r.findFirstIn(plan).isDefined &&
      """pd#\d+L? <= 100""".r.findFirstIn(plan).isDefined,
      "hub-cap degree filter must appear in the plan")
    // top-20 with full tie-breaks must plan as distributed top-k, not a
    // global sort
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrderedAndProject")
  }

  test("kcore: per-round peel plans are constant-size (Exchange count " +
      "does not grow with round index, every leaf is a checkpointed scan)") {
    val (_, _, rounds) = GraphOps.kcoreBuild(spark, sf)
    assert(rounds.size == 3)
    // the eager checkpoints execute each round as it is built, so
    // executedPlan shows AQE's runtime rewrites (broadcast promotion,
    // empty-relation collapse at small SF) — audit the pre-AQE physical
    // plan, the one the checkpoint discipline actually shapes
    val exchangeCounts = rounds.map { e =>
      val p = e.queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "peel semi-joins must never nested-loop")
      // the 2^depth failure mode: round r's plan embedding round r-1's
      // joins instead of reading its checkpointed RDD. Every leaf must
      // be a checkpoint scan — parquet appearing here means a prior
      // round's lineage leaked through
      assert(!p.contains("FileScan") && p.contains("Scan ExistingRDD"),
        "every peel input must be a checkpointed relation: " + p.take(300))
      "Exchange hashpartitioning".r.findAllIn(p).size
    }
    // without the per-round localCheckpoint the count grows with r
    assert(exchangeCounts.distinct.size == 1,
      s"per-round Exchange counts must match: ${exchangeCounts.mkString(",")}")
  }

  test("kcore: the quantile-k window runs over the degree-VALUE " +
      "relation, never the node relation") {
    val (_, kPre, _) = GraphOps.kcoreBuild(spark, sf)
    val windows = kPre.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(windows.size == 1, "exactly one window in the k computation")
    val childCols = windows.head.child.output.map(_.name).toSet
    assert(childCols == Set("d", "nv"),
      s"window child must be the (degree, count) value relation, got " +
        childCols.mkString(","))
  }
}
