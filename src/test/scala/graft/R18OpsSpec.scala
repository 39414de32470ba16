package graft

import graft.queries.{ServeOps, VectorQueries}

/** Round-18 op contracts. */
class R18OpsSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_semcache_lsh: the bucket-keyed cache is a strict SUBSET of the " +
      "exact cache — hits_lsh ≤ hits_exact at every τ, miss_delta ≥ 0, " +
      "rates consistent with their integer counts") {
    val rows = ServeOps.qSemcacheLsh(spark, sf).collect()
    assert(rows.length === 4, "one row per τ")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_queries")
      val he = r.getAs[Long]("hits_exact")
      val hl = r.getAs[Long]("hits_lsh")
      // an LSH candidate pair is an exact pair (same cosine, fewer
      // candidates), so the bucket-keyed decision can only MISS hits
      assert(hl <= he, s"tau=${r.getAs[Double]("tau")}: lsh hits $hl " +
        s"exceed exact hits $he — the candidate set leaked")
      assert(he <= n && hl >= 0)
      assert(r.getAs[Double]("hit_rate_exact") === rnd(he.toDouble / n, 6))
      assert(r.getAs[Double]("hit_rate_lsh") === rnd(hl.toDouble / n, 6))
      assert(r.getAs[Double]("miss_delta") === rnd((he - hl).toDouble / n, 6))
      assert(r.getAs[Double]("miss_delta") >= -1e-12)
    }
    // monotone in τ on both arms: a stricter threshold never adds hits
    val byTau = rows.sortBy(_.getAs[Double]("tau"))
    byTau.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("hits_exact") <= a.getAs[Long]("hits_exact"))
      assert(b.getAs[Long]("hits_lsh") <= a.getAs[Long]("hits_lsh"))
    }
  }

  test("q_semcache_lsh: same τ grid and query count discipline as the " +
      "exact q_semcache sweep (the two reports price the same stream " +
      "shape at different query deciles)") {
    val lsh = ServeOps.qSemcacheLsh(spark, sf).collect()
    val exact = VectorQueries.qSemcache(spark, sf).collect()
    assert(lsh.map(_.getAs[Double]("tau")).toSeq ===
      exact.map(_.getAs[Double]("tau")).toSeq)
    // %50 stream ⊂ %25 stream: the LSH report reads a subsample
    assert(lsh.head.getAs[Long]("n_queries") <=
      exact.head.getAs[Long]("n_queries"))
  }

  test("q_bpe_train: a sequential leftmost-greedy replay reproduces " +
      "every round's merge pick, pair count, and post-merge symbol " +
      "total (the relational run-parity apply IS the left-to-right scan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Corpus2Ops.qBpeTrain(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length === 6)
    val toks = Tables.df(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text"))
        .as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] =
      toks.map { case (t, c) => (t.map(_.toString).toArray, c) }
    def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += s(i); i += 1 }
      }
      buf.toArray
    }
    rows.foreach { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val ((a, b), n) = pc.toSeq
        .sortBy { case ((x, y), m) => (-m, x, y) }.head
      assert(r.getAs[String]("sym_a") === a
        && r.getAs[String]("sym_b") === b,
        s"round ${r.getAs[Int]("round")}: replay picked ($a,$b), " +
          s"query picked (${r.getAs[String]("sym_a")}," +
          s"${r.getAs[String]("sym_b")})")
      assert(r.getAs[Long]("pair_count") === n)
      vocab = vocab.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      val symsTotal = vocab.map { case (s, c) => s.length * c }.sum
      assert(r.getAs[Long]("corpus_symbols") === symsTotal,
        s"round ${r.getAs[Int]("round")}: post-merge symbol totals differ")
    }
    // the trajectory is monotone: every merge strictly shrinks the corpus
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(y.getAs[Long]("corpus_symbols") < x.getAs[Long]("corpus_symbols"))
    }
  }

  test("semcacheStream: replaying the query stream against the frozen " +
      "snapshot reproduces the batch q_semcache hit counts at every τ") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.df(spark, sf, "embeddings")
    val qset = emb.filter($"vec_id" % 25 === 0)
    val snap = qset.select($"vec_id".as("pid"), $"embedding".as("pv"))
      .localCheckpoint()
    val arriving = qset
      .select($"vec_id".as[Long], $"embedding".as[Array[Float]])
      .collect().toSeq.sortBy(_._1)
    assert(arriving.size >= 4)
    val (b1, b2) = arriving.splitAt(arriving.size / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("qid", "qv")
    val q = graft.streaming.Streams.semcacheStream(stream, snap)
      .writeStream.format("memory").queryName("semcache_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val best = spark.table("semcache_stream")
        .select($"qid".as[Long], $"best".as[Double]).collect().toMap
      val batch = VectorQueries.qSemcache(spark, sf).collect()
      batch.foreach { r =>
        val tau = r.getAs[Double]("tau")
        val hits = arriving.count { case (qid, _) =>
          best.get(qid).exists(_ >= tau) }
        assert(hits.toLong === r.getAs[Long]("hits"),
          s"tau=$tau: stream hits $hits vs batch ${r.getAs[Long]("hits")}")
        assert(arriving.size.toLong === r.getAs[Long]("n_queries"))
      }
    } finally q.stop()
  }

  test("retentionSweepStream: micro-batched tallies against the frozen " +
      "anchor equal the batch q_retention_sweep row-for-row (merge law)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.df(spark, sf, "events")
    val anchor = ev.select(to_date($"ts").as("day"))
      .agg(max($"day").as("anchor")).localCheckpoint()
    val rows = ev.select($"event_type".as[String],
        $"ts".cast("timestamp").as[java.sql.Timestamp],
        $"value".as[Double])
      .collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("event_type", "ts", "value")
    val q = graft.streaming.Streams.retentionSweepStream(stream, anchor)
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = spark.table("retention_stream").collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Int]("policy_days")) ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("rows_dropped"),
            BigDecimal(Option(r.get(r.fieldIndex("value_dropped")))
              .map(_.asInstanceOf[Double]).getOrElse(0.0))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
            String.valueOf(r.getAs[java.sql.Date]("oldest_kept_day")))
      }.toMap
      val want = graft.queries.GovernOps.qRetentionSweep(spark, sf)
        .collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Int]("policy_days")) ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("rows_dropped"),
            r.getAs[Double]("value_dropped"),
            String.valueOf(r.getAs[java.sql.Date]("oldest_kept_day")))
      }.toMap
      assert(got === want,
        s"stream tallies diverge from the batch sweep")
    } finally q.stop()
  }

  test("q_bpe_apply: per-source symbol totals reconcile EXACTLY with the " +
      "training trajectory's round-6 corpus total, and every row honors " +
      "the fertility/compression bounds") {
    val apply = graft.queries.Corpus2Ops.qBpeApply(spark, sf).collect()
    val train = graft.queries.Corpus2Ops.qBpeTrain(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(apply.nonEmpty && train.length === 6)
    // the per-source split is a pure re-grouping of the same final state:
    // source-summed symbols must equal the last round's corpus_symbols
    val srcSyms = apply.map(_.getAs[Long]("n_syms")).sum
    assert(srcSyms === train.last.getAs[Long]("corpus_symbols"),
      s"per-source symbols $srcSyms != trajectory total " +
        s"${train.last.getAs[Long]("corpus_symbols")}")
    apply.foreach { r =>
      val nt = r.getAs[Long]("n_tokens"); val nc = r.getAs[Long]("n_chars")
      val ns = r.getAs[Long]("n_syms")
      assert(ns <= nc, "merges can only shrink the symbol count")
      assert(ns >= nt, "every token is at least one symbol")
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0 - 1e-9)
      val c = r.getAs[Double]("compression")
      assert(c >= -1e-9 && c < 1.0)
    }
  }
}
