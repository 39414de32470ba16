package graft

import graft.queries.{CorpusOps, GraphOps, TextOps}
import org.apache.spark.sql.functions._

/** Non-circular reference checks for the round-6 corpus operators: each
  * distributed result is compared against a direct in-memory computation
  * over the same collected inputs (small at the test SF). */
class CorpusOpsSpec extends SparkSpec {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  test("triangle top-10 matches brute force over the same edge set") {
    import spark.implicits._
    val li = Tables.df(spark, sf, "lineitem")
      .filter($"l_partkey" % 5 === 0)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val edges = li.as("a")
      .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    // per (edge, common neighbor w): increment only w — each triangle then
    // bumps each of its three nodes exactly once (via its opposite edge)
    val cnt = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- edges; w <- adj(u) intersect adj(v))
      cnt(w) += 1L
    val expected = cnt.toSeq
      .sortBy { case (node, c) => (-c, node) }.take(10)
    val got = GraphOps.qTriangles(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.head._2 > 0, "fixture graph must have triangles")
  }

  test("bm25 top-10 matches a direct in-memory computation") {
    import spark.implicits._
    val docs = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1)))
      .filter(_._2.nonEmpty)
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, a) => (id, t) -> a.length }
    }.toMap
    val dfreq = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => t -> ks.size }
    val nDocs = dl.size.toDouble
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val avgdl = r6(dl.values.sum.toDouble / dl.size).toDouble
    val qterms = Seq((1, "hash"), (1, "join"), (2, "window"), (2, "agg"),
      (2, "stream"), (3, "slow"), (3, "scan"))
    val expected = qterms.groupBy(_._1).toSeq.flatMap { case (qid, terms) =>
      val scores = docs.flatMap { case (id, _) =>
        val s = terms.map { case (_, t) =>
          tf.get((id, t)).fold(BigDecimal(0)) { f =>
            val idf = math.log(1.0 +
              (nDocs - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
            r6(idf * (f * 2.2) /
              (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)))
          }
        }.sum
        if (s == BigDecimal(0)) None else Some(id -> s)
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s.toDouble, i + 1) }
    }.sortBy(t => (t._1, t._4))
    val got = CorpusOps.qBm25(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._4)) ===
      expected.map(t => (t._1, t._2, t._4)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"score mismatch: $g vs $e")
    }
  }

  test("bpe merge pairs match brute force over corpus token counts") {
    import spark.implicits._
    val toks = Tables.df(spark, sf, "documents")
      .select($"text").collect().flatMap(r => tokensOf(r.getString(0)))
    val tc = toks.groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val cnt = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((t, c) <- tc if t.length >= 2; i <- 0 until t.length - 1)
      cnt(t.substring(i, i + 2)) += c
    val expected = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
    val got = CorpusOps.qBpeMerges(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("incremental dedup exact branch fires on a synthetic duplicate") {
    // the driver fixture has no exact text duplicates, so the md5 probe's
    // precedence over the band probe is exercised here on a synthetic
    // table (the query reads any sfDir-shaped directory)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-incr")
      .toFile.getAbsolutePath
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, base, "en", "web", base.length.toLong),
      (2L, "completely different content about spark shuffles and joins",
        "en", "web", 60L),
      (3L, base, "en", "web", base.length.toLong), // batch: exact dup of 1
      (10L, "unique new content that matches nothing in the corpus xyzzy",
        "en", "web", 60L) // batch: novel
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.qDedupIncremental(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(3L -> "exact", 10L -> "new"))
  }

  test("incremental dedup statuses match brute-force fingerprint hamming") {
    import spark.implicits._
    val fps = TextOps.md5SimhashFps(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val (bFps, cFps) = fps.partition(_._1 % 7 == 3)
    val hashes = Tables.df(spark, sf, "documents")
      .select($"doc_id", md5($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val corpusH = hashes.filter(_._1 % 7 != 3).map(_._2).toSet
    val batchH = hashes.filter(_._1 % 7 == 3).toMap
    val expected = bFps.map { case (id, fp) =>
      val status =
        if (corpusH.contains(batchH(id))) "exact"
        else if (cFps.exists { case (_, cfp) =>
          java.lang.Long.bitCount(fp ^ cfp) <= 3 }) "near"
        else "new"
      id -> status
    }.sortBy(_._1).toSeq
    val got = TextOps.qDedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    assert(got.map(_._2).toSet.contains("new"),
      "fixture batch should contain genuinely new docs")
  }

  test("retrieval eval metrics are in range and consistent with the run") {
    import graft.queries.CorpusOps
    val rows = CorpusOps.qRetrievalEval(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3),
      "one row per query")
    for (r <- rows) {
      val p10 = r.getDouble(r.fieldIndex("p_at_10"))
      val mrr = r.getDouble(r.fieldIndex("mrr"))
      val ndcg = r.getDouble(r.fieldIndex("ndcg_at_10"))
      assert(p10 >= 0.0 && p10 <= 1.0, s"p@10 $p10")
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr $mrr")
      // nDCG against the TRUE ideal ordering can never exceed 1
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg $ndcg")
      // a nonzero MRR requires at least one fully-relevant doc to exist
      if (mrr > 0.0)
        assert(r.getLong(r.fieldIndex("n_rel_full")) > 0)
    }
    // the fixture corpus must actually exercise the metrics: some query
    // retrieves a fully-relevant doc inside its top-10
    assert(rows.exists(_.getDouble(2) > 0.0) ||
      rows.exists(r => r.getDouble(r.fieldIndex("mrr")) > 0.0),
      "no query retrieved any fully-relevant doc — qrels degenerate")
  }
}
