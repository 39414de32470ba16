package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles with the histogram-refine two-pass shape.
  *
  * Spark's built-in exact `percentile` aggregate buffers every value of the
  * group in one aggregation state, so a GLOBAL quantile (one group = the
  * whole table) ships the entire column through a single reducer — fine for
  * per-key groups, a guaranteed OOM at 100 TB. This kernel keeps every step
  * distributed and codegen-friendly:
  *
  *   1. one scan → global (min, max, count);
  *   2. one key-partitioned aggregation → a fixed-width histogram of
  *      `buckets` coarse cells (the only shuffle that sees every row);
  *   3. a cumulative count over the ≤`buckets`-row histogram (bounded
  *      single-partition window — `buckets` rows, not data-scale) locates
  *      which cell contains each target rank pos = (n-1)·frac;
  *   4. rank-refine ONLY inside the ≤2·|fracs| hit cells — and over the
  *      cell's DISTINCT values with their counts, not its raw rows, so a
  *      heavily tied distribution (80% of a count column equal to 1, or a
  *      fully constant column collapsing into cell 0) compresses to a few
  *      window rows instead of funneling a data-scale partition through
  *      one row_number sort; rank k maps to the distinct value whose
  *      cumulative-count range contains k. Then linear interpolation
  *      b = lo + (pos−⌊pos⌋)·(hi−lo) — the same arithmetic shape as SQL
  *      quantile_cont, so results oracle-compare exactly.
  *
  * At 1000× data, raise `buckets` so the per-cell DISTINCT count stays
  * executor-sized (for continuous data that is ~n/buckets; ties only
  * shrink it); the plan shape is unchanged. Values tied across a cell
  * boundary cannot happen (cells partition the value domain), so per-cell
  * cumulative ranking is a consistent global ranking.
  */
object Quantiles {

  /** Quantile boundaries of `valueCol` (cast to double) at `fracs`:
    * one row per frac, columns (frac, b), b unrounded. NULLs in `valueCol`
    * are excluded (as in SQL percentile/quantile_cont); `df` must have at
    * least one non-null value. */
  def exactQuantiles(df: DataFrame, valueCol: Column, fracs: Seq[Double],
      buckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // checkpointed: the kernel's stages (min/max pass, coarse histogram,
    // refine join) otherwise each re-execute the caller's scan+projection
    // chain — measured 3.3 → ~2.3 s warm on q_winsorize at sf0.1
    val v = df.select(valueCol.cast("double").as("vd")).filter($"vd".isNotNull)
      .localCheckpoint()
    val mm = v.agg(min($"vd").as("mn"), max($"vd").as("mx"),
      count(lit(1)).as("n"))

    // coarse cell per row; a degenerate (all-equal) column lands in cell 0
    val bucketed = v.crossJoin(broadcast(mm))
      .select($"vd",
        when($"mx" === $"mn", lit(0)).otherwise(
          least(floor(($"vd" - $"mn") / (($"mx" - $"mn") / buckets))
            .cast("int"), lit(buckets - 1))).as("bkt"))
    val wb = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bucketed.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(sum($"cnt").over(wb), lit(0L)))

    // the two ranks bracketing pos = (n-1)*frac, 1-indexed; `which` 0 = the
    // floor side, 1 = the ceiling side of the interpolation
    val targets = fracs.toDF("frac")
      .crossJoin(broadcast(mm.select($"n")))
      .select($"frac", (($"n" - 1) * $"frac").as("pos"))
      .select($"frac", floor($"pos").cast("long").as("k0"),
        ($"pos" - floor($"pos")).as("fp"))
    val ranks = targets
      .select($"frac", $"fp", posexplode(array($"k0" + 1, $"k0" + 2)))
      .toDF("frac", "fp", "which", "k")
    // locate each rank's cell: |fracs|×buckets row band join, both tiny
    val kb = ranks.join(broadcast(cum),
        $"cum_before" < $"k" && $"k" <= $"cum_before" + $"cnt")
      .select($"frac", $"fp", $"which", $"bkt",
        ($"k" - $"cum_before").as("rk"))

    // refine inside the hit cells over DISTINCT values + counts (ties
    // collapse before the window); rank k falls in the distinct value
    // whose cumulative range [cum_end - c + 1, cum_end] contains it
    val needed = kb.select($"bkt").distinct()
    val wr = Window.partitionBy($"bkt").orderBy($"vd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bucketed.join(broadcast(needed), "bkt")
      .groupBy($"bkt", $"vd").agg(count(lit(1)).as("c"))
      .withColumn("cum_end", sum($"c").over(wr))
    val hit = ranked.join(broadcast(kb),
      ranked("bkt") === kb("bkt")
        && $"rk" > $"cum_end" - $"c" && $"rk" <= $"cum_end")
      .drop(kb("bkt"))

    // the ceiling rank k0+2 can fall off the table's end when pos is
    // integral there — its interpolation weight is exactly 0, so lo stands
    hit.groupBy($"frac", $"fp")
      .agg(min(when($"which" === 0, $"vd")).as("lo"),
        min(when($"which" === 1, $"vd")).as("hi"))
      .select($"frac",
        ($"lo" + $"fp" * (coalesce($"hi", $"lo") - $"lo")).as("b"))
  }

  /** The exact k-th smallest values of `valueCol` — 1-indexed ranks
    * arriving as the (tiny) relation `ks(k BIGINT)` — via the same
    * histogram-refine shape as [[exactQuantiles]]: coarse histogram,
    * locate each rank's cell, per-cell DISTINCT-value refine. No global
    * sort anywhere, and no interpolation: an order statistic is
    * algorithm-independent, so a plain ORDER BY + row_number oracle on
    * the other engine replays the value bit-for-bit (ties collapse —
    * the value at rank k does not depend on tie-break order among
    * equals). Built for q_conformal's ⌈(n+1)(1−α)⌉-th residual (the
    * r13 verdict's fix for its corpus-wide row_number); any "give me
    * rank k of a data-scale column" caller should come through here.
    * Returns (k, v). Ranks outside [1, n] emit no row. */
  def orderStatistics(df: DataFrame, valueCol: Column, ks: DataFrame,
      buckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(valueCol.cast("double").as("vd"))
      .filter($"vd".isNotNull)
      .localCheckpoint() // min/max pass + histogram + refine join
    val mm = v.agg(min($"vd").as("mn"), max($"vd").as("mx"))
    val bucketed = v.crossJoin(broadcast(mm))
      .select($"vd",
        when($"mx" === $"mn", lit(0)).otherwise(
          least(floor(($"vd" - $"mn") / (($"mx" - $"mn") / buckets))
            .cast("int"), lit(buckets - 1))).as("bkt"))
    // bounded single-partition window: <= `buckets` histogram rows
    val wb = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bucketed.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(sum($"cnt").over(wb), lit(0L)))
    val kb = ks.select($"k").join(broadcast(cum),
        $"cum_before" < $"k" && $"k" <= $"cum_before" + $"cnt")
      .select($"k", $"bkt", ($"k" - $"cum_before").as("rk"))
    val needed = kb.select($"bkt").distinct()
    val wr = Window.partitionBy($"bkt").orderBy($"vd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bucketed.join(broadcast(needed), "bkt")
      .groupBy($"bkt", $"vd").agg(count(lit(1)).as("c"))
      .withColumn("cum_end", sum($"c").over(wr))
    ranked.join(broadcast(kb),
        ranked("bkt") === kb("bkt")
          && $"rk" > $"cum_end" - $"c" && $"rk" <= $"cum_end")
      .select($"k", $"vd".as("v"))
  }
}
