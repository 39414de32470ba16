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

  private def hashExchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed edge table removes the per-iteration edge-side Exchange") {
    import spark.implicits._
    // the q_pagerank graph: symmetrized customer↔supplier co-purchase
    val li = Tables.df(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ords = Tables.df(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ords, $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("c:"), $"o_custkey").as("u"),
        concat(lit("s:"), $"l_suppkey").as("v"))
      .distinct()
    val edges = pairs.union(pairs.select($"v".as("u"), $"u".as("v")))
    Sources.writeBucketed(edges, "graft_pr_edges", 4, "u")
    // force sort-merge joins: on fixture-sized sides the planner would
    // broadcast and ignore bucketing — at scale neither side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plainDeg = edges
        .groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
      val plain = GraphOps.pagerankLoop(edges, plainDeg, 3)
      val bucketed = GraphOps.pagerankBucketed(spark, "graft_pr_edges", 3)
      val nPlain = hashExchanges(plain)
      val nBucketed = hashExchanges(bucketed)
      // The specific property (ADVICE r7): the bucketed plan actually
      // READS the table as buckets — the scan advertises its bucket
      // selection, which is what makes its output HashPartitioned and
      // lets the join consume it without an Exchange above the scan.
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(bucketedPlan.contains("SelectedBucketsCount"),
        "edge-table scan is not a bucketed read — no SelectedBucketsCount " +
          "in the plan")
      // Robust direction: strictly fewer hash exchanges, always.
      assert(nBucketed < nPlain,
        s"bucketed plan has $nBucketed hash exchanges vs $nPlain plain")
      // Measured delta pinned to this build (Spark 4.1.2): 3 iterations
      // each drop the edge-side Exchange and the degree aggregate becomes
      // map-side against the bucket partitioning — at least 4 fewer. A
      // Spark upgrade that re-plans this differently should relax the
      // constant, not delete the strict inequality above.
      assert(nBucketed <= nPlain - 4,
        s"bucketed plan has $nBucketed hash exchanges vs $nPlain plain — " +
          "bucketing did not remove the per-iteration edge-side shuffle")
      // identical data + identical rounding discipline => identical rows
      val got = bucketed.collect().toSeq
      assert(got == plain.collect().toSeq, "bucketed result diverged")
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges")
    }
  }
}
