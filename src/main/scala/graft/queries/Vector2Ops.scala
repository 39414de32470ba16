package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector-store additions (r14): binary quantization with its recall
  * price sheet, a moment-based kernel two-sample test over embedding
  * space, and label-filtered ANN serving — three capabilities every
  * production vector platform ships beside the core index.
  *
  * Determinism discipline: bit codes come from exact comparisons
  * against exact middle-two medians, Hamming distance is integer
  * xor+popcount, and the MMD moments are once-rounded decimal sums —
  * nothing here calls libm, so every output hash-checks cross-engine.
  */
object Vector2Ops extends QueryPack {

  private val dec12 = DecimalType(38, 12)

  // ---- q_binary_quantize ---------------------------------------------------
  /** Binary (1-bit) embedding quantization + its retrieval price sheet:
    * each dimension thresholds at its exact per-dimension median (the
    * balanced-bit rule), the 64 bits pack into ONE long per vector
    * (64× compression vs float32), and the report prices what that
    * costs: for the %100 query decile, recall@10 of Hamming-distance
    * top-10 (xor + popcount on the codes) against the exact-cosine
    * top-10 truth, plus the mean Hamming distance of the true
    * neighbors. This is the bit-sliced first-pass filter every modern
    * vector store offers (binary quantization + exact re-rank); the
    * report is the evidence for/against enabling it on THIS corpus.
    *
    * Scale shape: medians are per-dimension middle-two order statistics
    * (64 value-partitioned rank windows — never a global sort); codes
    * are one groupBy; the eval scans q×n CODE pairs (longs, not
    * vectors — the honest documented cost, 64× cheaper than the float
    * brute force it replaces); truth reuses the broadcast-query exact
    * pass (an evaluation op prices its own ground truth). */
  def qBinaryQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.df(spark, sfDir, "embeddings")
    val dims = emb.select($"vec_id",
        posexplode($"embedding".cast("array<double>")).as(Seq("i", "x")))
      .localCheckpoint() // median rank pass + the bit pass
    val cnt = dims.groupBy($"i").agg(count(lit(1)).as("n"))
    val wD = Window.partitionBy($"i").orderBy($"x", $"vec_id")
    val med = dims.withColumn("rn", row_number().over(wD))
      .join(broadcast(cnt), "i")
      .filter($"rn" === expr("(n + 1) div 2")
        || $"rn" === expr("(n + 2) div 2"))
      .groupBy($"i")
      .agg((sum($"x") / count(lit(1))).as("med"))
    val codes = dims.join(broadcast(med), "i")
      .groupBy($"vec_id")
      .agg(sum(when($"x" > $"med",
        expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0L))
        .as("code"))
      .localCheckpoint() // query side + corpus side of the code scan
    val q = codes.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"code".as("qc"))
    val ham = codes.join(broadcast(q), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        expr("bit_count(code ^ qc)").as("hd"))
      .localCheckpoint() // top-10 window + the truth-distance join
    val wH = Window.partitionBy($"qid").orderBy($"hd".asc, $"vec_id".asc)
    val hamTop = ham.withColumn("r", row_number().over(wH))
      .filter($"r" <= 10).select($"qid", $"vec_id")
    graft.functions.CosineSimilarity.register(spark)
    val qv = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val wC = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    val truth = emb.join(broadcast(qv), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        round(expr("cosine_similarity(qe, embedding)"), 6).as("sim"))
      .withColumn("r", row_number().over(wC))
      .filter($"r" <= 10).select($"qid", $"vec_id")
    val hits = truth.join(hamTop.withColumn("f", lit(1L)),
        Seq("qid", "vec_id"), "left")
      .groupBy($"qid").agg(sum(coalesce($"f", lit(0L))).as("hit"))
    val hamOfTrue = truth.join(ham, Seq("qid", "vec_id"))
      .groupBy($"qid").agg(sum($"hd").as("hsum"))
    hits.join(hamOfTrue, Seq("qid"))
      .select($"qid", $"hit".as("hits10"),
        round($"hit".cast("double") / 10.0, 6).as("recall10"),
        round($"hsum".cast("double") / 10.0, 6).as("mean_hamming_true"))
      .orderBy($"qid")
  }

  // ---- q_mmd_poly ----------------------------------------------------------
  /** Kernel two-sample test between label groups in embedding space,
    * WITHOUT pair joins (Gretton et al. '12 MMD, degree-2 polynomial
    * kernel): for k(x,y) = x·y, MMD² = ‖μ_A − μ_B‖²; for k(x,y) =
    * (x·y)², MMD² = ‖E_A[xx'] − E_B[xx']‖_F² — both are CLOSED FORMS in
    * per-group first/second moment matrices, so the whole test is one
    * corpus pass to a (label, i, j) cell relation plus a 45-row pair
    * join of 36-cell signatures. That is the 100 TB point: the usual
    * MMD estimator is O(n²) kernel evaluations; the polynomial-kernel
    * moment form ships k×d² numbers per group and nothing else. Scored
    * over the first 8 dimensions (d² = 36 upper-triangle cells).
    * Moment terms round once to 12dp into exact decimal sums; the two
    * MMD² values are per-cell squared diffs (off-diagonals ×2 for the
    * Frobenius count), once-rounded into decimal sums, ×1e6 for a
    * readable scale. */
  def qMmdPoly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.df(spark, sfDir, "embeddings")
      .select($"vec_id", $"label",
        posexplode(slice($"embedding".cast("array<double>"), 1, 8))
          .as(Seq("i", "x")))
      .localCheckpoint() // first-moment pass + the pair-cell pass
    val m1 = dims.groupBy($"label", $"i")
      .agg((sum(round($"x", 12).cast(dec12)).cast("double")
        / count(lit(1))).as("m"))
    val cells = dims.join(
        dims.select($"vec_id", $"i".as("j"), $"x".as("xj")),
        Seq("vec_id"))
      .filter($"i" <= $"j")
      .groupBy($"label", $"i", $"j")
      .agg((sum(round($"x" * $"xj", 12).cast(dec12)).cast("double")
        / count(lit(1))).as("m2"))
    def pairs(df: DataFrame, cols: Seq[String], v: String): DataFrame = {
      val a = df.toDF(("la" +: cols :+ (v + "a")): _*)
      val b = df.toDF(("lb" +: cols :+ (v + "b")): _*)
      a.join(b, cols).filter($"la" < $"lb")
    }
    val lin = pairs(m1, Seq("i"), "m")
      .select($"la", $"lb",
        round(($"ma" - $"mb") * ($"ma" - $"mb"), 12).cast(dec12).as("t"))
      .groupBy($"la", $"lb")
      .agg(round(sum($"t").cast("double") * 1e6, 6).as("mmd2_lin_e6"))
    // Frobenius ×2 multiplies INSIDE the single rounding (a decimal ×
    // int would widen past precision 38 and silently drop the scale)
    val quad = pairs(cells, Seq("i", "j"), "m2")
      .select($"la", $"lb",
        round(($"m2a" - $"m2b") * ($"m2a" - $"m2b")
          * when($"i" === $"j", 1.0).otherwise(2.0), 12)
          .cast(dec12).as("t"))
      .groupBy($"la", $"lb")
      .agg(round(sum($"t").cast("double") * 1e6, 6).as("mmd2_quad_e6"))
    lin.join(quad, Seq("la", "lb"))
      .select($"la".as("label_a"), $"lb".as("label_b"),
        $"mmd2_lin_e6", $"mmd2_quad_e6")
      .orderBy($"label_a", $"label_b")
  }

  // ---- q_ann_filtered ------------------------------------------------------
  /** Label-FILTERED ANN serving — the "vector search with a metadata
    * predicate" feature every vector store advertises: the %10 query
    * decile's top-3 SAME-LABEL neighbors, candidates from the md5-SRP
    * multiprobe serving chain ([[VectorQueries.annMd5Pairs]] — the
    * post-filter strategy: retrieve by similarity, then apply the
    * predicate before the rank window). Deterministic end to end, so
    * the filtered neighbor lists themselves hash-check. Scale: the
    * filter is a projection over the already-bucket-routed pair list —
    * filtered search costs nothing beyond the unfiltered chain until
    * selectivity gets so low that probing must widen (that trade is
    * exactly what q_ann_multiprobe prices). */
  def qAnnFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lab = Tables.df(spark, sfDir, "embeddings")
      .select($"vec_id", $"label")
    val pairs = VectorQueries.annMd5Pairs(spark, sfDir).localCheckpoint()
    val cands = pairs.filter($"id1" % 10 === 0)
      .select($"id1".as("qid"), $"id2".as("nid"), $"sim")
      .unionAll(pairs.filter($"id2" % 10 === 0)
        .select($"id2".as("qid"), $"id1".as("nid"), $"sim"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"nid".asc)
    cands
      .join(lab.select($"vec_id".as("qid"), $"label".as("ql")), "qid")
      .join(lab.select($"vec_id".as("nid"), $"label".as("nl")), "nid")
      .filter($"ql" === $"nl")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid", $"sim", $"ql".as("label"))
      .orderBy($"qid", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_quantize" -> qBinaryQuantize,
    "q_mmd_poly" -> qMmdPoly,
    "q_ann_filtered" -> qAnnFiltered
  )

  val oracle: Map[String, String] = Map(
    // same exact medians, same bit packing (1::BIGINT << i two's
    // complement in both engines), xor+bit_count Hamming, same windows
    "q_binary_quantize" ->
      """WITH dims AS (
        |  SELECT vec_id, r.i, CAST(embedding[r.i + 1] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(0, 64) r(i)),
        |cnt AS (SELECT i, count(*) AS n FROM dims GROUP BY i),
        |med AS (
        |  SELECT i, sum(x) / count(*) AS med FROM (
        |    SELECT d.i, d.x, row_number() OVER (PARTITION BY d.i
        |      ORDER BY d.x, d.vec_id) AS rn, c.n
        |    FROM dims d JOIN cnt c ON c.i = d.i)
        |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |  GROUP BY i),
        |codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN d.x <= m.med THEN 0
        |      WHEN d.i = 63 THEN -9223372036854775808
        |      ELSE (1::BIGINT << d.i) END) AS BIGINT) AS code
        |  FROM dims d JOIN med m ON m.i = d.i
        |  GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, code AS qc FROM codes
        |      WHERE vec_id % 100 = 0),
        |ham AS (
        |  SELECT q.qid, c.vec_id,
        |    bit_count(xor(c.code, q.qc)) AS hd
        |  FROM codes c JOIN q ON c.vec_id != q.qid),
        |hamtop AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |      ORDER BY hd ASC, vec_id ASC) AS r FROM ham)
        |  WHERE r <= 10),
        |truth AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qe.vec_id AS qid, e.vec_id,
        |      row_number() OVER (PARTITION BY qe.vec_id
        |        ORDER BY round(list_cosine_similarity(
        |          CAST(qe.embedding AS DOUBLE[]),
        |          CAST(e.embedding AS DOUBLE[])), 6) DESC,
        |        e.vec_id ASC) AS r
        |    FROM embeddings e
        |    JOIN embeddings qe ON qe.vec_id % 100 = 0
        |      AND e.vec_id != qe.vec_id)
        |  WHERE r <= 10),
        |hits AS (
        |  SELECT t.qid,
        |    CAST(sum(CASE WHEN h.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hit
        |  FROM truth t LEFT JOIN hamtop h
        |    ON h.qid = t.qid AND h.vec_id = t.vec_id
        |  GROUP BY t.qid),
        |hot AS (
        |  SELECT t.qid, CAST(sum(ham.hd) AS BIGINT) AS hsum
        |  FROM truth t JOIN ham ON ham.qid = t.qid
        |    AND ham.vec_id = t.vec_id
        |  GROUP BY t.qid)
        |SELECT hits.qid, hits.hit AS hits10,
        |  round(CAST(hits.hit AS DOUBLE) / 10.0, 6) AS recall10,
        |  round(CAST(hot.hsum AS DOUBLE) / 10.0, 6) AS mean_hamming_true
        |FROM hits JOIN hot ON hot.qid = hits.qid
        |ORDER BY hits.qid""".stripMargin,

    // same 12dp moment terms, same upper-triangle cells with the x2
    // Frobenius weight, same 1e6 output scale
    "q_mmd_poly" ->
      """WITH dims AS (
        |  SELECT vec_id, label, r.i,
        |    CAST(embedding[r.i + 1] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(0, 8) r(i)),
        |m1 AS (
        |  SELECT label, i,
        |    CAST(sum(CAST(round(x, 12) AS DECIMAL(38,12))) AS DOUBLE)
        |      / count(*) AS m
        |  FROM dims GROUP BY label, i),
        |cells AS (
        |  SELECT a.label, a.i, b.i AS j,
        |    CAST(sum(CAST(round(a.x * b.x, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) / count(*) AS m2
        |  FROM dims a JOIN dims b ON b.vec_id = a.vec_id AND a.i <= b.i
        |  GROUP BY a.label, a.i, b.i),
        |lin AS (
        |  SELECT a.label AS la, b.label AS lb,
        |    round(CAST(sum(CAST(round((a.m - b.m) * (a.m - b.m), 12)
        |      AS DECIMAL(38,12))) AS DOUBLE) * 1000000.0, 6)
        |      AS mmd2_lin_e6
        |  FROM m1 a JOIN m1 b ON b.i = a.i AND a.label < b.label
        |  GROUP BY a.label, b.label),
        |quad AS (
        |  SELECT a.label AS la, b.label AS lb,
        |    round(CAST(sum(CAST(round((a.m2 - b.m2) * (a.m2 - b.m2)
        |      * (CASE WHEN a.i = a.j THEN 1.0 ELSE 2.0 END), 12)
        |      AS DECIMAL(38,12))) AS DOUBLE)
        |      * 1000000.0, 6) AS mmd2_quad_e6
        |  FROM cells a JOIN cells b ON b.i = a.i AND b.j = a.j
        |    AND a.label < b.label
        |  GROUP BY a.label, b.label)
        |SELECT lin.la AS label_a, lin.lb AS label_b,
        |  lin.mmd2_lin_e6, quad.mmd2_quad_e6
        |FROM lin JOIN quad ON quad.la = lin.la AND quad.lb = lin.lb
        |ORDER BY label_a, label_b""".stripMargin
  ) ++ Map(
    // the serving multiprobe chain + label equality before the rank
    // window — the post-filter strategy, deterministic end to end
    "q_ann_filtered" ->
      (VectorQueries.annFilteredOracleSql)
  )
}
