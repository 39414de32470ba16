package graft

import graft.queries._

/** Plan-shape audits for the round-10 late-batch operators — the
  * scale-relevant physical properties (equi-join candidate generation,
  * broadcast of 1-row/thin relations, no global rank sorts, no
  * cartesians on corpus-sized inputs) locked in so a refactor that
  * silently loses them fails CI. */
class R10PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def noCorpusCartesian(plan: String, name: String): Unit =
    assert(!plan.contains("CartesianProduct"),
      s"$name must not plan a CartesianProduct:\n" + plan.take(600))

  test("containment: candidates come from a shingle-keyed equi-join, " +
      "never a nested loop over documents") {
    val plan = planOf(CurateOps.qContainment(spark, sf))
    noCorpusCartesian(plan, "q_containment")
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the inverted-index self-join must be an equi-join")
  }

  test("assoc rules: the pair join keys on the order id (equi), the " +
      "only broadcast-nested-loop is the 1-row basket total") {
    val plan = planOf(Analytics.qAssocRules(spark, sf))
    noCorpusCartesian(plan, "q_assoc_rules")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"only the 1-row n_orders cross join may be BNLJ " +
      s"($bnlj found)")
  }

  test("hits: every half-step joins scores by key; totals broadcast") {
    val plan = planOf(GraphOps.qHits(spark, sf))
    noCorpusCartesian(plan, "q_hits")
    assert(plan.contains("BroadcastExchange"),
      "the L1 totals must broadcast back into the score projection")
  }

  test("kneser-ney: one windowed bigram stream feeds scoring; model " +
      "joins are equi-joins on checkpointed thin relations") {
    val plan = planOf(CorpusOps.qKneserNey(spark, sf))
    noCorpusCartesian(plan, "q_kneser_ney")
    assert(plan.contains("Window"),
      "bigrams must come from the lead() window, not a self-join")
    assert(plan.contains("Scan ExistingRDD") ||
      plan.contains("LocalTableScan"),
      "the bigram-type relation must be checkpointed, not recomputed")
  }

  test("gains/rfm/propensity: decile/quintile assignment has no global " +
      "rank window (ntile-free)") {
    Seq("q_gains" -> planOf(LearnOps.qGains(spark, sf)),
      "q_rfm" -> planOf(Analytics.qRfm(spark, sf)),
      "q_propensity" -> planOf(EventOps.qPropensity(spark, sf)))
      .foreach { case (n, plan) =>
        assert(!"""\bntile\(""".r.findFirstIn(plan).isDefined,
          s"$n must bin via broadcast percentile cuts, not global ntile")
      }
  }

  test("returns: one episode-partitioned window, no event self-join") {
    val plan = planOf(EventOps.qReturns(spark, sf))
    noCorpusCartesian(plan, "q_returns")
    assert(!plan.contains("SortMergeJoin"),
      "the episode walk is windows + a broadcast baseline join — a " +
        "sort-merge join means the events stream is self-joining:\n"
        + plan.take(600))
  }

  test("bootstrap: resampling is a projection (explode), with no join " +
      "wider than the broadcast replicate summary") {
    val plan = planOf(StatsOps.qBootstrapCi(spark, sf))
    noCorpusCartesian(plan, "q_bootstrap_ci")
    assert(plan.contains("Generate explode"),
      "the 32 replicates must fan out via explode, not a join")
  }

  test("watermark: detector is explode + one doc-partitioned lag " +
      "window + thin aggregates — no joins at all") {
    val plan = planOf(CurateOps.qWatermark(spark, sf))
    assert(!plan.contains("Join"),
      "the greenlist detector needs no join anywhere:\n" + plan.take(600))
    assert(plan.contains("Window"))
  }
}
