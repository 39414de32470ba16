package graft

import graft.queries.{CorpusOps, GovernOps, GraphOps, PipelineOps}
import org.apache.spark.sql.functions._

/** Semantic contracts of the round-9 governance/assembly operators —
  * properties the oracle hash alone doesn't explain. */
class GovernPipelineR9Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("kl divergence is positive off-diagonal and keys every source pair") {
    val rows = GovernOps.qKlSources(spark, sf).collect()
    val srcs = Tables.df(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(rows.length === srcs * (srcs - 1), "complete off-diagonal matrix")
    // Gibbs' inequality: KL > 0 for distinct distributions (the fixture
    // sources are distinct corpora); smoothing keeps every term finite
    for (r <- rows)
      assert(r.getAs[Double]("kl") > 0.0,
        s"${r.getString(0)}->${r.getString(1)} kl=${r.getAs[Double]("kl")}")
  }

  test("temperature sampling flattens the mixture and replays exactly") {
    import spark.implicits._
    val rows = PipelineOps.qTempSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_src"),
        r.getAs[Double]("share"), r.getAs[Double]("rate"),
        r.getAs[Long]("n_kept")))
    // α < 1 flattens: the largest source's share of the mix must be
    // SMALLER than its share of the corpus, the smallest source's larger
    val nTot = rows.map(_._2).sum.toDouble
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    if (big._2 > small._2) {
      assert(big._3 < big._2 / nTot, "α-smoothing must shrink big sources")
      assert(small._3 > small._2 / nTot, "…and grow small sources")
    }
    // exact replay of every keep decision from the reported rate
    val docs = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rate = rows.map(r => r._1 -> r._4).toMap
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      src -> ds.count { case (id, _) =>
        val u = (java.lang.Long.parseLong(
          md5Hex(s"ts:$id").substring(0, 15), 16) + 1) / 1.152921504606846976e18
        u < rate(src)
      }.toLong
    }
    assert(rows.map(r => r._1 -> r._5).toMap === want)
  }

  test("batch padding: batches hold ≤32 docs and the accounting is exact") {
    val rows = PipelineOps.qBatchPadding(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs"); val mx = r.getAs[Long]("max_tok")
      val sm = r.getAs[Long]("sum_tok"); val pad = r.getAs[Long]("padding")
      assert(n >= 1 && n <= 32)
      assert(pad === n * mx - sm)
      assert(sm <= n * mx)
      // every doc in a bucket fits the bucket's pad-to-16 grid cell
      assert(mx <= r.getAs[Long]("bucket"))
    }
  }

  test("dedup sweep counts are monotone in the threshold") {
    val rows = graft.queries.CurateOps.qDedupSweep(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq === Seq("0.70", "0.80", "0.90"))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val drops = rows.map(_.getAs[Long]("n_dropped"))
    assert(pairs(0) >= pairs(1) && pairs(1) >= pairs(2),
      "tightening the threshold can only lose pairs")
    assert(docs(0) >= docs(1) && docs(1) >= docs(2))
    assert(drops(0) >= drops(1) && drops(1) >= drops(2))
    for (i <- rows.indices)
      assert(drops(i) <= docs(i) && docs(i) <= 2 * pairs(i).max(0))
  }

  test("modularity detects the bipartite LPA collapse: exactly Q = -0.5") {
    val rows = GraphOps.qModularity(spark, sf).collect()
    // even-round synchronous LPA on a bipartite graph settles on the two
    // SIDES: every edge crosses communities and each side carries half
    // the degree mass, so Q = 0 - (1/2)² - (1/2)² = -0.5 exactly — the
    // degenerate-partition signal this metric exists to catch
    assert(rows.length === 2, s"side partition expected: ${rows.length}")
    assert(rows.map(_.getAs[Long]("intra_edges")).sum === 0L,
      "bipartite sides have no intra edges")
    val q = rows.map(_.getAs[Double]("q_term")).sum
    assert(math.abs(q - (-0.5)) < 1e-9, s"Q=$q, expected exactly -0.5")
    // and the degree accounting is exact: the two sides split 2m evenly
    val ds = rows.map(_.getAs[Long]("degree_sum"))
    assert(ds(0) === ds(1), "each undirected edge gives one degree per side")
  }

  test("skip-gram top-50 is consistent with the collocation pair stream") {
    import spark.implicits._
    val sg = CorpusOps.qSkipgram(spark, sf).collect()
    assert(sg.length === 50)
    // dist-1 skip-gram counts are exactly the adjacent-bigram counts the
    // PMI query is built on — cross-check one against a direct recount
    val top = sg.filter(_.getAs[Int]("dist") == 1).head
    val (c, x, n) = (top.getString(0), top.getString(1), top.getAs[Long]("n"))
    val recount = Tables.df(spark, sf, "documents")
      .select(graft.functions.TextFunctions.tokens($"text").as("tk"))
      .collect()
      .map(_.getSeq[String](0))
      .map(tk => tk.sliding(2).count(p => p.length == 2 &&
        p.head == c && p(1) == x))
      .sum
    assert(recount.toLong === n, s"($c,$x) dist-1 count $n vs $recount")
  }
}
