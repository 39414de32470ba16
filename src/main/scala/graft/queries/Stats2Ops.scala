package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistics/experimentation additions (r15): a goodness-of-fit audit
  * of the repo's own determinism primitive, and the power side of the
  * q_mde experiment-sizing pair.
  */
object Stats2Ops extends QueryPack {

  private val dec12 = DecimalType(28, 12)

  // ---- q_cvm_uniform -------------------------------------------------------
  /** Cramér–von Mises uniformity audit of the HOUSE md5-uniform
    * generator — the determinism primitive every md5-keyed sampler,
    * bootstrap, derangement, and noise draw in this repo rides on
    * (q_block_bootstrap, q_tablesample, q_permutation_test, q_dp_*).
    * Over a 512-key spine, u_k = (int(md5("cvm:"||k)[0:15 hex]) + 1) /
    * 2⁶⁰ — exactly the conv/substring rule used everywhere — and the
    * CvM statistic W² = 1/(12n) + Σᵢ (u₍ᵢ₎ − (2i−1)/(2n))² scores the
    * empirical CDF against U(0,1); W² above the 5% critical value 0.461
    * would mean the house "uniforms" carry structure and every
    * md5-seeded result is suspect. This is the infrastructure
    * self-test: the repo asserts its generator's quality in-band, where
    * the correctness gate can hash-check it cross-engine forever.
    * No libm beyond the division; squared deviations round once to 12dp
    * into exact decimal sums. Scale: a 512-row spine by construction —
    * the one rank window is spine-bounded, never data-grain (the audit
    * measures the generator, not the corpus). */
  def qCvmUniform(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = 512
    val u = spark.range(1, n + 1)
      .select($"id".cast("int").as("k"))
      .withColumn("u",
        (conv(substring(md5(concat(lit("cvm:"), $"k".cast("string"))),
          1, 15), 16, 10).cast("long") + 1)
          / lit(1152921504606846976.0))
    val ranked = u.withColumn("rn",
      row_number().over(Window.orderBy($"u", $"k")))
    val agg = ranked.select(
        round(($"u" - ((lit(2) * $"rn" - 1).cast("double") / (2 * n)))
          * ($"u" - ((lit(2) * $"rn" - 1).cast("double") / (2 * n))), 12)
          .cast(dec12).as("sq"),
        round($"u", 12).cast(dec12).as("ud"))
      .agg(sum($"sq").as("ssq"), sum($"ud").as("su"))
    agg.select(lit(n.toLong).as("n"),
        round(lit(1.0 / (12 * n)) + $"ssq".cast("double"), 6).as("w2"),
        round($"su".cast("double") / n, 6).as("mean_u"))
      .withColumn("uniform_ok", $"w2" < 0.461)
  }

  // ---- q_power_curve -------------------------------------------------------
  /** Statistical power across a relative-lift grid — the other half of
    * the q_mde sizing pair: q_mde answers "what's the smallest effect
    * THIS traffic can detect at 80% power", this answers "what power
    * does THIS traffic give at each effect size the team actually
    * debates" (1/2/5/10/20% relative). Same user-day conversion grain
    * and pooled rate as q_mde; per lift, the detectable-z margin is
    * z = mde_abs/SE − z_{α/2} and power = Φ(z) via the logistic
    * approximation Φ(z) ≈ 1/(1+e^(−1.702z)) (Bowling et al. '09,
    * max abs error < 0.01) — a POLYNOMIAL-FREE portable form both
    * engines evaluate identically (erf is not in either engine's
    * portable surface; the approximation error is far below any
    * decision boundary a sizing call turns on, and is documented in
    * the column name's _approx suffix). Exact-integer counts until the
    * shared double formulas, each rounded once. Scale: one events pass
    * to the user-day grain, then a 5-row broadcast grid. */
  def qPowerCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("d"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
    val c = ud.agg(count(lit(1)).as("n_ud"), sum($"conv").as("n_conv"))
    val lifts = Seq(0.01, 0.02, 0.05, 0.10, 0.20).toDF("lift_rel")
    c.crossJoin(broadcast(lifts))
      .withColumn("p0", $"n_conv".cast("double") / $"n_ud")
      .withColumn("se",
        sqrt(lit(2.0) * $"p0" * (lit(1.0) - $"p0")
          / ($"n_ud".cast("double") / 2)))
      .withColumn("z", $"p0" * $"lift_rel" / $"se" - 1.959964)
      .select($"lift_rel", $"n_ud",
        round($"p0", 6).as("p_pool"),
        round($"p0" * $"lift_rel", 6).as("mde_abs"),
        round($"z", 6).as("z_margin"),
        round(lit(1.0) / (lit(1.0) + exp(lit(-1.702) * $"z")), 6)
          .as("power_approx"))
      .withColumn("powered", $"power_approx" >= 0.8)
      .orderBy($"lift_rel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cvm_uniform" -> qCvmUniform,
    "q_power_curve" -> qPowerCurve
  )

  val oracle: Map[String, String] = Map(
    // same conv/substr md5-to-uniform rule, same 12dp squared-deviation
    // decimal sums, same closed form
    "q_cvm_uniform" ->
      """WITH ks AS (
        |  SELECT CAST(unnest(range(1, 513)) AS INT) AS k),
        |u AS (
        |  SELECT k,
        |    (('0x' || substr(md5('cvm:' || k::VARCHAR), 1, 15))::BIGINT
        |      + 1) / 1152921504606846976.0 AS u
        |  FROM ks),
        |r AS (
        |  SELECT u, row_number() OVER (ORDER BY u, k) AS rn FROM u),
        |a AS (
        |  SELECT
        |    sum(CAST(round((u - (2 * rn - 1) / 1024.0)
        |      * (u - (2 * rn - 1) / 1024.0), 12) AS DECIMAL(28,12)))
        |      AS ssq,
        |    sum(CAST(round(u, 12) AS DECIMAL(28,12))) AS su
        |  FROM r)
        |SELECT CAST(512 AS BIGINT) AS n,
        |  round(1.0 / 6144 + CAST(ssq AS DOUBLE), 6) AS w2,
        |  round(CAST(su AS DOUBLE) / 512, 6) AS mean_u,
        |  round(1.0 / 6144 + CAST(ssq AS DOUBLE), 6) < 0.461
        |    AS uniform_ok
        |FROM a""".stripMargin,

    // the q_mde user-day grain + pooled rate, 5-row lift grid, shared
    // SE/z forms, logistic Phi
    "q_power_curve" ->
      """WITH ud AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ud,
        |    CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM ud),
        |g AS (SELECT unnest([0.01, 0.02, 0.05, 0.10, 0.20])
        |  AS lift_rel),
        |f AS (
        |  SELECT lift_rel, n_ud,
        |    CAST(n_conv AS DOUBLE) / n_ud AS p0,
        |    sqrt(2.0 * (CAST(n_conv AS DOUBLE) / n_ud)
        |      * (1.0 - CAST(n_conv AS DOUBLE) / n_ud)
        |      / (CAST(n_ud AS DOUBLE) / 2)) AS se
        |  FROM c CROSS JOIN g),
        |z AS (
        |  SELECT lift_rel, n_ud, p0,
        |    p0 * lift_rel / se - 1.959964 AS z
        |  FROM f)
        |SELECT lift_rel, n_ud,
        |  round(p0, 6) AS p_pool,
        |  round(p0 * lift_rel, 6) AS mde_abs,
        |  round(z, 6) AS z_margin,
        |  round(1.0 / (1.0 + exp(-1.702 * z)), 6) AS power_approx,
        |  round(1.0 / (1.0 + exp(-1.702 * z)), 6) >= 0.8 AS powered
        |FROM z ORDER BY lift_rel""".stripMargin
  )
}
