package graft

import graft.queries.XModalOps
import graft.Tables
import org.apache.spark.sql.functions._

/** Cross-modal family contracts (VERDICT r16 #5): the media-tower
  * fixture assumption, retrieval soundness, JS bounds/symmetry, and the
  * no-pair-join plan audit — the spec coverage the r16 landing missed. */
class XModalSpec extends SparkSpec {

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("media tower fixture assumption: every payload char is ASCII " +
      "(char code ≡ UTF-8 byte) and every payload is non-empty") {
    import spark.implicits._
    val bad = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"text")
      .filter(length($"text") === 0
        || expr("exists(sequence(1, length(text)), " +
          "p -> ascii(substr(text, p, 1)) > 127)"))
      .count()
    assert(bad === 0L,
      "the 64-bin char histogram stands in for a byte histogram ONLY " +
        "while the documents payload is non-empty ASCII — a non-ASCII " +
        "or empty fixture breaks the tower, not just this spec")
  }

  test("q_xmodal_align: attrition report is internally consistent and " +
      "covers every embedded doc") {
    import spark.implicits._
    val rows = XModalOps.qXmodalAlign(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pairs")
      val nk = r.getAs[Long]("n_keep")
      assert(nk + r.getAs[Long]("n_drop") === np)
      assert(r.getAs[Double]("keep_rate") === rnd(nk.toDouble / np, 6))
      assert(math.abs(r.getAs[Double]("mean_cos")) <= 1.0)
    }
    // non-empty ASCII text ⇒ the media histogram is non-empty and the
    // 64-dim text vector overlaps it, so no doc falls out of the gate
    val nDocs = Tables.df(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nDocs)
  }

  test("q_xmodal_retrieval: every query ranks its own true pair " +
      "(brute-force candidates), recall@10 ≥ recall@1, MRR ∈ (0, 1]") {
    import spark.implicits._
    val rows = XModalOps.qXmodalRetrieval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r1 = r.getAs[Double]("r_at_1")
      val r10 = r.getAs[Double]("r_at_10")
      val mrr = r.getAs[Double]("mrr")
      assert(r10 >= r1)
      assert(mrr > 0.0 && mrr <= 1.0)
      // each @1 hit contributes a full reciprocal rank
      assert(mrr >= r1 - 1e-9)
    }
    // the true pair is always in its own candidate set: the eval is
    // brute-force over ALL media vectors, so every %25 query doc must
    // surface exactly once in the per-source counts
    val nQ = Tables.df(spark, sf, "embeddings")
      .filter($"vec_id" % 25 === 0).count()
    assert(rows.map(_.getAs[Long]("n_q")).sum === nQ)
  }

  test("q_mauve_lite: JS ∈ [0, ln 2], js_dist = √JS, all 8 cells " +
      "present, half-swap symmetry replays bit-for-bit") {
    val rows = XModalOps.qMauveLite(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("cell")).sorted.toSeq === (0 until 8))
    val jsd = rows.head.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12)
    // half-swap symmetry: rebuilding every 9dp term with the halves'
    // roles exchanged must reproduce the reported terms and total —
    // JS(P,Q) = JS(Q,P) must survive the smoothing and the rounding
    val ta = rows.map(_.getAs[Long]("n_even")).sum
    val tb = rows.map(_.getAs[Long]("n_odd")).sum
    val swapped = rows.sortBy(_.getAs[Int]("cell")).map { r =>
      val pa = (r.getAs[Long]("n_odd") + 1).toDouble / (tb + 8)
      val pb = (r.getAs[Long]("n_even") + 1).toDouble / (ta + 8)
      val mm = (pa + pb) / 2
      BigDecimal(0.5 * pa * math.log(pa / mm)
          + 0.5 * pb * math.log(pb / mm))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    rows.sortBy(_.getAs[Int]("cell")).zip(swapped).foreach {
      case (r, s) =>
        assert(r.getAs[Double]("js_term") === s.toDouble,
          s"cell ${r.getAs[Int]("cell")}: JS term not swap-symmetric")
    }
    assert(jsd === rnd(swapped.sum.toDouble, 6))
    // js_dist roots the UNROUNDED term sum (not the 6dp jsd)
    assert(rows.head.getAs[Double]("js_dist")
      === rnd(math.sqrt(math.max(swapped.sum.toDouble, 0.0)), 6))
  }

  test("plan audit: the alignment towers meet ONLY in equi-joins — no " +
      "cartesian/nested-loop pair stage anywhere in the physical plan") {
    val p = XModalOps.qXmodalAlign(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"),
      "q_xmodal_align must never plan a pair cross product: " +
        p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "q_xmodal_align's tower joins must stay (doc_id, dim) " +
        "equi-joins: " + p.take(400))
  }

  test("media tower v2: the two channels have DISJOINT blind spots — " +
      "each crafted payload pair fools exactly one channel and is " +
      "caught by the other") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    def histMap(df: DataFrame): Map[Long, Map[Int, Long]] =
      df.collect()
        .groupBy(_.getAs[Long]("doc_id"))
        .map { case (id, rows) =>
          id -> rows.map(r =>
            r.getAs[Int]("dim") -> r.getAs[Long]("h")).toMap }
    // CHANNEL-1 BLIND: swapping two chars exactly 64 positions apart
    // leaves every (char + pos) % 64 bin unchanged ((c + p + 64) % 64 =
    // (c + p) % 64), so the positional histogram cannot see it — the
    // bigram channel sees the changed neighborhoods
    val mid = "f" * 63
    val blind1 = Seq((1L, "x" + mid + "y"), (2L, "y" + mid + "x"))
      .toDF("doc_id", "text")
    val h1 = histMap(XModalOps.mediaHistOf(blind1))
    val h1b = histMap(XModalOps.mediaHist2Of(blind1))
    assert(h1(1L) === h1(2L),
      "channel 1 must be blind to the 64-apart swap")
    assert(h1b(1L) !== h1b(2L),
      "channel 2 must SEE the 64-apart swap")
    // CHANNEL-2 BLIND: an Eulerian re-ordering preserves the bigram
    // multiset (abaca and acaba both walk {ab, ba, ac, ca}), so the
    // bigram histogram cannot see it — the positional channel sees the
    // moved characters
    val blind2 = Seq((1L, "abaca"), (2L, "acaba")).toDF("doc_id", "text")
    val h2 = histMap(XModalOps.mediaHist2Of(blind2))
    val h2a = histMap(XModalOps.mediaHistOf(blind2))
    assert(h2(1L) === h2(2L),
      "channel 2 must be blind to the Eulerian re-ordering")
    assert(h2a(1L) !== h2a(2L),
      "channel 1 must SEE the Eulerian re-ordering")
  }

  test("q_media_entropy: two-channel gate — mean_entropy2 sits under " +
      "the ln 64 uniform bound and the degenerate count honors the " +
      "min-of-channels rule") {
    val rows = XModalOps.qMediaEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val ln64 = math.log(64.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_entropy") <= ln64 + 1e-9)
      assert(r.getAs[Double]("mean_entropy2") <= ln64 + 1e-9)
      assert(r.getAs[Long]("n_degenerate") >= 0
        && r.getAs[Long]("n_degenerate") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_xmodal_retrieval_ann: candidate-restricted metrics respect " +
      "the n_found budget — every rate is bounded by the index's " +
      "true-pair recall, and a found pair ranks at least as well as in " +
      "the brute sweep's candidate-free ranking") {
    val ann = XModalOps.qXmodalRetrievalAnn(spark, sf).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val nq = r.getAs[Long]("n_q"); val nf = r.getAs[Long]("n_found")
      assert(nf <= nq)
      val cap = nf.toDouble / nq
      assert(r.getAs[Double]("r_at_1") <= cap + 1e-9,
        "r@1 cannot exceed the found fraction")
      assert(r.getAs[Double]("r_at_10") <= cap + 1e-9)
      assert(r.getAs[Double]("mrr") <= cap + 1e-9,
        "each found pair contributes at most 1/1 to MRR")
    }
    // the index is not vacuous on the fixture: SOMETHING is found
    assert(ann.map(_.getAs[Long]("n_found")).sum > 0,
      "the shared-hyperplane buckets must surface at least one true pair")
  }

  test("short-payload gate (ADVICE r18): a 1-char asset STAYS in both " +
      "doc-grain relations — entropy2 defaults to 0 nats (degenerate), " +
      "cs2 is NULL and fails the two-channel gate — instead of " +
      "vanishing by inner-join absence") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "hello world, a normal payload"))
      .toDF("doc_id", "text")
    val ents = XModalOps.docEntropies(docs).orderBy($"doc_id").collect()
    assert(ents.length === 2,
      "the 1-char doc must stay in the entropy relation")
    assert(ents(0).getAs[Double]("entropy") === 0.0,
      "a 1-char payload's positional histogram is one bin — 0 nats")
    assert(ents(0).getAs[Double]("entropy2") === 0.0,
      "the missing bigram channel must default to 0 nats, not drop")
    assert(ents(1).getAs[Double]("entropy2") > 0.0)
    // the degenerate rule counts it: least(0, 0) < 2.0
    assert(math.min(ents(0).getAs[Double]("entropy"),
      ents(0).getAs[Double]("entropy2")) < 2.0)
    // alignment: positive text tower ⇒ cs ≥ 0, but cs2 is NULL — the
    // two-channel gate (cs >= 0 AND cs2 >= 0) must FAIL, not pass by
    // absence
    val txtv = docs.select($"doc_id")
      .crossJoin(spark.range(0, 64).select($"id".cast("int").as("dim")))
      .select($"doc_id", $"dim",
        expr("CAST(0.125 AS DECIMAL(18,6))").as("x"))
    val cos = XModalOps.docAlignCos(docs, txtv).orderBy($"doc_id").collect()
    assert(cos.length === 2,
      "the 1-char doc must stay in the alignment relation")
    val i2 = cos(0).fieldIndex("cs2")
    assert(cos(0).isNullAt(i2),
      "missing bigram channel must surface as NULL, not drop the row")
    assert(!cos(0).isNullAt(cos(0).fieldIndex("cs")))
    assert(cos(0).getAs[Double]("cs") >= 0.0)
    assert(!cos(1).isNullAt(i2))
    // replay the gate predicate exactly as qXmodalAlign applies it
    val kept = XModalOps.docAlignCos(docs, txtv)
      .select(sum(when($"cs" >= 0.0 && $"cs2" >= 0.0, 1L).otherwise(0L))
        .as("n_keep"), count(lit(1)).as("n_pairs"))
      .collect().head
    assert(kept.getAs[Long]("n_pairs") === 2L)
    assert(kept.getAs[Long]("n_keep") === 1L,
      "the short doc must count as DROPPED by the gate, not as kept " +
        "and not as absent")
  }
}
