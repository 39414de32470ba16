package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics as relational plans. Companion to
  * [[graft.operators.Components]]: where connected components converges by
  * fixpoint, PageRank runs a fixed unrolled iteration count, so the whole
  * computation is one static plan that any SQL engine can mirror — which
  * puts an iterative-linear-algebra workload under the DuckDB hash gate.
  *
  * Scale notes: each iteration is exactly one shuffle pair — join
  * (edges × ranks) on the source key, then groupBy the destination key —
  * the textbook Pregel-as-SQL shape; degrees and ranks ride along as
  * columns so no per-iteration broadcast of global state is needed (the
  * single 1-row node-count aggregate broadcasts once).
  *
  * Determinism: contributions round once to DECIMAL(28,14) before the
  * per-destination SUM (exact, order-independent), and the damped rank
  * rounds to 12 decimals each iteration, so both engines carry identical
  * doubles into the next round.
  */
object GraphOps extends QueryPack {

  /** PageRank (damping 0.85, 3 unrolled iterations) over the bipartite
    * customer↔supplier co-purchase graph (distinct pairs through
    * lineitem→orders), symmetrized so every node has out-degree ≥ 1 (no
    * dangling-mass redistribution needed). Output: top 25 nodes. */
  def qPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.df(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ords = Tables.df(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ords, $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("c:"), $"o_custkey").as("u"),
        concat(lit("s:"), $"l_suppkey").as("v"))
      .distinct()
    // the unrolled plan references edges 3× and deg 4× — materialize both
    // once (same "cache the graph, iterate on it" shape GraphX uses)
    // instead of re-running the lineitem⋈orders distinct per reference
    val edges = pairs.union(pairs.select($"v".as("u"), $"u".as("v")))
      .localCheckpoint()
    val deg = edges.groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nTotal = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nTotal))
      .select($"node", $"deg", $"n", (lit(1.0) / $"n").as("pr"))
    for (_ <- 1 to 3) {
      val contrib = edges.join(pr, edges("u") === pr("node"))
        .select($"v".as("node"),
          round($"pr" / $"deg", 12).cast(DecimalType(28, 14)).as("w"))
        .groupBy($"node").agg(sum($"w").as("sw"))
      pr = pr.select($"node", $"deg", $"n")
        .join(contrib, Seq("node"), "left")
        .select($"node", $"deg", $"n",
          round(lit(0.15) / $"n"
            + lit(0.85) * coalesce($"sw".cast("double"), lit(0.0)), 12)
            .as("pr"))
    }
    pr.select($"node", round($"pr", 9).as("pr"))
      .orderBy($"pr".desc, $"node".asc)
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank
  )

  private def iterSql(prev: String, cur: String): String =
    s"""c$cur AS (
       |  SELECT e.v AS node,
       |    SUM(CAST(round(p.pr / p.deg, 12) AS DECIMAL(28,14))) AS sw
       |  FROM e JOIN p$prev p ON e.u = p.node GROUP BY e.v),
       |p$cur AS (
       |  SELECT d.node, d.deg,
       |    round(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
       |      + CAST(0.85 AS DOUBLE)
       |        * COALESCE(CAST(sw AS DOUBLE), 0.0), 12) AS pr
       |  FROM deg d LEFT JOIN c$cur ON c$cur.node = d.node)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pagerank" ->
      s"""WITH pairs AS (
        |  SELECT DISTINCT 'c:' || o_custkey AS u, 's:' || l_suppkey AS v
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
        |deg AS (SELECT u AS node, count(*) AS deg FROM e GROUP BY u),
        |nn AS (SELECT count(*) AS n FROM deg),
        |p0 AS (SELECT node, deg,
        |         CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM deg),
        |${iterSql("0", "1")},
        |${iterSql("1", "2")},
        |${iterSql("2", "3")}
        |SELECT node, round(pr, 9) AS pr FROM p3
        |ORDER BY pr DESC, node ASC LIMIT 25""".stripMargin
  )
}
