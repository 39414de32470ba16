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
}
