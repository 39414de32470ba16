package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.Row

/** The ANN-fed pair sources behind q_lof / q_hard_negatives: the oracle
  * twins use a brute-force pair source so DuckDB can replay them; the
  * corpus-scale paths (lofAnn / hardNegativesAnn) feed the SAME downstream
  * stages from LSH bucket equi-joins. These tests pin the measured recall
  * of the scale path against the exact brute-force answer on the real
  * fixture — the requirement that killed prose-only scale stories. */
class AnnConsumersSpec extends SparkSpec {

  test("lofAnn recovers the brute-force LOF ranking (top-20 recall >= 0.9)") {
    // the fixture's LOF scores are all < the 1.3 outlier cut (uniform-ish
    // synthetic embeddings have no strong density outliers), so pin the
    // recall on the RANKING the flag derives from: the 20 most-outlying
    // points by brute-force LOF must reappear in the ANN-fed top 20 —
    // plus flag agreement, which also guards the cut itself if the
    // fixture ever grows true outliers
    def top20(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .orderBy(org.apache.spark.sql.functions.col("lof").desc,
        org.apache.spark.sql.functions.col("vec_id"))
      .limit(20).select("vec_id").collect().map(_.getLong(0)).toSet
    val bruteDf = VectorQueries.qLof(spark, sf)
    val annDf = VectorQueries.lofAnn(spark, sf)
    val brute = top20(bruteDf)
    val ann = top20(annDf)
    val recall = brute.count(ann.contains).toDouble / brute.size
    assert(recall >= 0.9,
      s"ANN-fed LOF top-20 recall $recall (brute $brute vs ann $ann)")
    val bruteFlagged = bruteDf.filter("outlier").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val annFlagged = annDf.filter("outlier").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    if (bruteFlagged.nonEmpty) {
      val flagRecall =
        bruteFlagged.count(annFlagged.contains).toDouble / bruteFlagged.size
      assert(flagRecall >= 0.9, s"outlier-flag recall $flagRecall")
    }
  }

  test("q_ann_eval: multiprobe serving recall >= 0.45 per band, >= 0.5 " +
      "overall (r14 Hamming-1 adoption — was 0.09-0.19 single-probe)") {
    val rows = VectorQueries.qAnnEval(spark, sf).collect()
    assert(rows.nonEmpty, "q_ann_eval produced no bands")
    rows.foreach { r =>
      val recall = r.getDouble(r.fieldIndex("recall"))
      assert(recall >= 0.45,
        s"band ${r.get(0)} recall $recall below the multiprobe floor — " +
          "the serving config regressed (q_ann_eval gate)")
    }
    val nTruth = rows.map(_.getLong(1)).sum
    val nFound = rows.map(_.getLong(2)).sum
    val overall = nFound.toDouble / nTruth
    assert(overall >= 0.5, s"overall serving recall $overall < 0.5")
  }

  test("annKnnCosine recovers the brute-force kNN pair list (recall >= 0.9)") {
    import spark.implicits._
    val sub = Tables.df(spark, sf, "embeddings")
      .filter($"vec_id" % 2 === 0)
    val brute = graft.operators.Similarity.knnBruteForce(sub, sub, 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.operators.Similarity.annKnnCosine(sub, sub, 5, 1.4, 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    assert(recall >= 0.9,
      s"ANN kNN pair recall $recall over ${brute.size} brute pairs")
  }

  test("hardNegativesAnn recovers the brute-force hard-anchor set " +
      "(recall >= 0.9) and their mined negatives (>= 0.9 agreement)") {
    def byId(rows: Array[Row]): Map[Long, Row] =
      rows.map(r => r.getLong(r.fieldIndex("vec_id")) -> r).toMap
    val brute = byId(VectorQueries.qHardNegatives(spark, sf).collect())
    val ann = byId(VectorQueries.hardNegativesAnn(spark, sf).collect())
    assert(brute.nonEmpty)
    assert(ann.keySet == brute.keySet,
      "every anchor must appear in both outputs (left join back to s)")
    val hardBrute = brute.filter { case (_, r) =>
      !r.isNullAt(r.fieldIndex("hard")) && r.getBoolean(r.fieldIndex("hard"))
    }.keySet
    assert(hardBrute.nonEmpty, "fixture produced no brute-force hard anchors")
    val hardAnn = ann.filter { case (_, r) =>
      !r.isNullAt(r.fieldIndex("hard")) && r.getBoolean(r.fieldIndex("hard"))
    }.keySet
    val hardRecall = hardBrute.count(hardAnn.contains).toDouble / hardBrute.size
    assert(hardRecall >= 0.9,
      s"hard-anchor recall $hardRecall (${hardBrute.size} brute hard anchors)")
    // the mined negative itself: same neg_id as brute force for >= 0.9 of
    // anchors whose brute negative exists
    val withNeg = brute.filter { case (_, r) =>
      !r.isNullAt(r.fieldIndex("neg_id")) }
    val negAgree = withNeg.count { case (id, r) =>
      val ar = ann(id)
      !ar.isNullAt(ar.fieldIndex("neg_id")) &&
        ar.getLong(ar.fieldIndex("neg_id")) == r.getLong(r.fieldIndex("neg_id"))
    }.toDouble / withNeg.size
    assert(negAgree >= 0.9,
      s"mined-negative agreement $negAgree over ${withNeg.size} anchors")
  }
}
