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
}
