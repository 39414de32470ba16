package graft

import graft.queries.CorpusOps
import org.apache.spark.sql.functions._

/** Properties of the corpus-law diagnostics the DuckDB hash gate can't
  * see: the Zipf fit's row budget and sign, Heaps-growth invariants
  * (including the pinned vocabulary-exhaustion reading on the 31-type
  * fixture), n-gram novelty's axioms (first decile all-novel, counts
  * consistent, global sum of new types = global type count), and the
  * plan shapes that make each a single corpus scan. */
class R10bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_zipf_fit --------------------------------------------------------

  test("zipf fit: n = min(1000, vocab), near-uniform fixture reads " +
      "negative-but-shallow slope with low r2") {
    val row = CorpusOps.qZipfFit(spark, sf).collect().head
    val vocab = Tables.df(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text")))
      .distinct().count()
    assert(row.getAs[Long]("n") == math.min(1000L, vocab))
    val slope = row.getAs[Double]("slope")
    val r2 = row.getAs[Double]("r2")
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    assert(slope > -1.0 && r2 < 0.5,
      s"synthetic near-uniform vocabulary must NOT look like natural " +
        s"text (slope $slope, r2 $r2) — if this fires the fixture changed")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("zipf fit plan: top-1000 is a distributed TakeOrderedAndProject, " +
      "the single-partition window sees only the 1000-row relation") {
    val plan = CorpusOps.qZipfFit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "vocabulary truncation must not be a global sort")
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- q_heaps_growth ----------------------------------------------------

  test("heaps growth: cumulative sums consistent, vocabulary conserved, " +
      "and the 31-type fixture saturates in decile 0 (pinned)") {
    val rows = CorpusOps.qHeapsGrowth(spark, sf)
      .select($"bucket", $"n_toks", $"new_types", $"cum_toks", $"cum_vocab")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until rows.length))
    // cum columns are exact prefix sums of the per-bucket columns
    assert(rows.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      rows.map(_._4).toSeq)
    assert(rows.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ==
      rows.map(_._5).toSeq)
    // every type is new exactly once: final cum_vocab = global vocab
    val vocab = Tables.df(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text")))
      .distinct().count()
    assert(rows.last._5 == vocab)
    // the pinned fixture reading: the synthetic vocabulary exhausts
    // immediately, so every later decile contributes zero new types
    assert(rows.head._3 == vocab && rows.tail.forall(_._3 == 0L),
      "31-type fixture must saturate in decile 0 — fixture changed?")
  }

  // ---- q_ngram_novelty ---------------------------------------------------

  test("ngram novelty: decile 0 is all-novel, new <= types, and novel " +
      "types sum to the global distinct 3-gram count") {
    val rows = CorpusOps.qNgramNovelty(spark, sf)
      .select($"bucket", $"types", $"new_types", $"novelty")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.head._3 == rows.head._2 && rows.head._4 == 1.0,
      "everything in the first corpus prefix is novel by definition")
    rows.foreach { case (b, t, n, nov) =>
      assert(n <= t, s"bucket $b: new_types $n > types $t")
      assert(nov >= 0.0 && nov <= 1.0)
    }
    val global = Tables.df(spark, sf, "documents")
      .select(explode(array_distinct(
        graft.functions.TextFunctions.shingles($"text", 3))).as("g"))
      .distinct().count()
    assert(rows.map(_._3).sum == global,
      "each 3-gram type must be counted as new in exactly one decile")
  }

  test("corpus-prefix queries stay equi-join only (no cartesian, no " +
      "nested-loop beyond the 1-row max broadcast)") {
    for (q <- Seq(CorpusOps.qHeapsGrowth(spark, sf),
        CorpusOps.qNgramNovelty(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
    }
  }

  // ---- q_ivm_agg ---------------------------------------------------------

  test("ivm merge law: merged base⊎delta states equal the flat recompute " +
      "exactly, row for row") {
    val merged = graft.queries.Aggregates.qIvmAgg(spark, sf)
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val flat = Tables.df(spark, sf, "orders")
      .groupBy($"o_orderpriority").agg(
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(dec2)).cast("double").as("sum_price"),
        min($"o_totalprice".cast(dec2)).cast("double").as("min_price"),
        max($"o_totalprice".cast(dec2)).cast("double").as("max_price"))
      .withColumn("avg_price", round($"sum_price" / $"n_orders", 6))
      .orderBy($"o_orderpriority")
    assert(merged.collect().toSeq == flat.collect().toSeq)
  }

  // ---- q_abtest ----------------------------------------------------------

  test("abtest: arms partition the user-days, rates replay exactly, and " +
      "z's sign follows the rate difference") {
    val row = graft.queries.EventOps.qAbtest(spark, sf).collect().head
    val (na, ca) = (row.getAs[Long]("n_a"), row.getAs[Long]("c_a"))
    val (nb, cb) = (row.getAs[Long]("n_b"), row.getAs[Long]("c_b"))
    val userDays = Tables.df(spark, sf, "events")
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(na + nb == userDays, "arms must partition the unit population")
    assert(ca <= na && cb <= nb)
    assert(ca > 0 && ca < na && cb > 0 && cb < nb,
      "daily conversion must be strictly inside (0,1) — the user-day " +
        "unit exists precisely because lifetime conversion saturates")
    val z = row.getAs[Double]("z")
    assert(z.signum == (row.getAs[Double]("p_a") - row.getAs[Double]("p_b"))
      .signum, "z must carry the sign of the observed difference")
  }

  // ---- q_span_corrupt ----------------------------------------------------

  test("span corruption: realized mask ratio tracks p=38/256, spans are " +
      "1-3 tokens, masked tokens never exceed totals") {
    val rows = graft.queries.PipelineOps.qSpanCorrupt(spark, sf)
      .select($"lang", $"n_tokens", $"n_masked", $"n_spans", $"mask_ratio")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val (tot, masked, spans) =
      (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    val ratio = masked.toDouble / tot
    assert(math.abs(ratio - 38.0 / 256) < 0.03,
      s"corpus mask ratio $ratio drifted from the 0.1484 coin")
    rows.foreach { case (lang, t, m, s, r) =>
      assert(m <= t && s <= m && m <= 3 * s,
        s"$lang: span accounting broken (t=$t m=$m s=$s)")
      assert(r > 0.0 && r < 1.0)
    }
  }

  // ---- q_centroid_drift --------------------------------------------------

  test("centroid drift: exactly k-choose-2 ordered pairs, cosines in " +
      "[-1,1], and the matrix covers every label pair once") {
    val emb = Tables.df(spark, sf, "embeddings")
    val k = emb.select($"label").distinct().count().toInt
    val rows = graft.queries.VectorQueries.qCentroidDrift(spark, sf)
      .select($"la", $"lb", $"cos_sim").as[(Int, Int, Double)].collect()
    assert(rows.length == k * (k - 1) / 2)
    assert(rows.forall { case (a, b, c) =>
      a < b && c >= -1.0000005 && c <= 1.0000005 })
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  // ---- q_common_neighbors ------------------------------------------------

  test("common neighbors: every reported pair replays exactly against " +
      "the brute-force part sets") {
    val got = graft.queries.GraphOps.qCommonNeighbors(spark, sf)
      .select($"c1", $"c2", $"common", $"d1", $"d2", $"jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 30)
    val sets = Tables.df(spark, sf, "lineitem")
      .join(Tables.df(spark, sf, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (c, ps) => c -> ps.map(_._2).toSet }
    got.foreach { case (c1, c2, common, d1, d2, j) =>
      val (s1, s2) = (sets(c1), sets(c2))
      assert(common == (s1 & s2).size, s"($c1,$c2) common")
      assert(d1 == s1.size && d2 == s2.size, s"($c1,$c2) degrees")
      assert(math.abs(j - common.toDouble / (s1 | s2).size) < 1e-6)
      assert(common >= 2 && common <= math.min(d1, d2))
    }
  }

  test("streaming ivm twin: base+delta micro-batches converge to the " +
      "batch merge exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cutoff = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val rows = Tables.df(spark, sf, "orders")
      .select($"o_orderpriority".as[String], $"o_totalprice".as[Double],
        $"o_orderdate".as[java.sql.Timestamp]).collect().toSeq
    val (base, delta) = rows.partition(_._3.before(cutoff))
    assert(base.nonEmpty && delta.nonEmpty, "cutoff must split the fixture")
    val input = MemoryStream[(String, Double)]
    val q = graft.streaming.Streams
      .ivmSummaryStream(input.toDF().toDF("o_orderpriority", "o_totalprice"))
      .writeStream.format("memory").queryName("ivm_stream")
      .outputMode("complete").start()
    try {
      input.addData(base.map(r => (r._1, r._2)))
      q.processAllAvailable()
      input.addData(delta.map(r => (r._1, r._2)))
      q.processAllAvailable()
      val got = spark.table("ivm_stream").orderBy($"o_orderpriority")
        .collect().toSeq
      val want = graft.queries.Aggregates.qIvmAgg(spark, sf).collect().toSeq
      assert(got == want,
        "the streaming state must equal the batch base⊎delta merge")
    } finally q.stop()
  }

  // ---- q_offline_eval ----------------------------------------------------

  test("offline eval: contexts partition the eval half, the learned " +
      "policy replays, and SNIPS is a weighted average of real rewards") {
    val rows = graft.queries.EventOps.qOfflineEval(spark, sf)
      .select($"ctx", $"pi_action", $"n_eval", $"n_match",
        $"logged_avg", $"ips_value", $"snips_value")
      .as[(Int, String, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3))
    val evalHalf = Tables.df(spark, sf, "events")
      .filter($"event_id" % 2 === 1).count()
    assert(rows.map(_._3).sum == evalHalf,
      "context rows must partition the eval half")
    val maxReward = Tables.df(spark, sf, "events")
      .agg(max($"value")).as[Double].head()
    rows.foreach { case (ctx, pi, n, m, logged, ips, snips) =>
      assert(m > 0 && m <= n, s"ctx $ctx match count")
      assert(ips >= 0.0, s"ctx $ctx: IPS of nonneg rewards is nonneg")
      assert(snips >= 0.0 && snips <= maxReward + 1e-6,
        s"ctx $ctx: SNIPS $snips must be a weighted avg of rewards")
      assert(logged > 0.0)
    }
    // the learned policy is the argmax mean reward on the LEARN half
    val expectPi = {
      val learn = Tables.df(spark, sf, "events")
        .filter($"event_id" % 2 === 0)
        .select(expr("CAST(get_json_object(props, '$.k') AS INT) div 25")
          .cast("int").as("ctx"), $"event_type".as("a"), $"value")
        .groupBy($"ctx", $"a").agg(avg($"value").as("m"))
        .as[(Int, String, Double)].collect()
      learn.groupBy(_._1).map { case (c, as) =>
        c -> as.minBy(t => (-math.rint(t._3 * 1e6) / 1e6, t._2))._2 }
    }
    rows.foreach { case r =>
      assert(r._2 == expectPi(r._1),
        s"ctx ${r._1}: policy ${r._2} != replayed ${expectPi(r._1)}") }
  }

  // ---- q_bradley_terry ---------------------------------------------------

  test("bradley-terry: win accounting is consistent and the first MM " +
      "iteration replays bit-for-bit") {
    val rows = graft.queries.LearnOps.qBradleyTerry(spark, sf)
      .select($"part", $"n_games", $"wins", $"s_1", $"s_2")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (p, n, w, si, s2) =>
      assert(w >= 0 && w <= n, s"part $p wins")
      val replay = math.rint((w + 0.5) * 2.0 / (n + 1) * 1e9) / 1e9
      assert(math.abs(si - replay) < 1e-12,
        s"part $p: s_1 $si != MM replay $replay")
      assert(s2 > 0.0, "pseudo-count keeps every strength positive")
    }
    // output is the top-20 by s_2 with the pinned tie-break
    assert(rows.sortBy(r => (-r._5, r._1)).toSeq == rows.toSeq)
  }

  test("similarity-pair plans: wedges meet in equi-joins and top-30 is " +
      "a distributed TakeOrderedAndProject") {
    val plan = graft.queries.GraphOps.qCommonNeighbors(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("TakeOrderedAndProject"))
    val cd = graft.queries.VectorQueries.qCentroidDrift(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!cd.contains("CartesianProduct"))
  }
}
