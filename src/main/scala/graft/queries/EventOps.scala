package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch twins of the streaming transforms (SURVEY.md §2.10): the same
  * Streams.* code paths, run over the static events table so the DuckDB
  * oracle can hash-check their semantics. Watermark/late-data behavior is
  * covered by MemoryStream unit tests (StreamingSpec) since a batch oracle
  * cannot observe it.
  *
  * Spark's tumbling/sliding windows are epoch-aligned, so the oracle
  * reconstructs bucket starts with floor(epoch/width)*width arithmetic —
  * engine-portable by construction.
  */
object EventOps extends QueryPack {

  def qTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.tumblingCounts(Tables.df(spark, sfDir, "events"), "5 minutes")
      .orderBy($"w_start", $"event_type")
  }

  def qSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.slidingCounts(Tables.df(spark, sfDir, "events"),
      "10 minutes", "5 minutes")
      .orderBy($"w_start", $"event_type")
  }

  def qSession(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Streams.sessionize(Tables.df(spark, sfDir, "events"), "10 minutes")
      .orderBy($"user_id", $"s_start")
  }

  /** Batch twin of streaming dedup: double the stream, dedup by event_id
    * (keep-first is deterministic here because duplicates are identical). */
  def qDedupEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.df(spark, sfDir, "events")
    val doubled = ev.unionAll(ev)
    doubled.agg(count(lit(1)).as("n_before"))
      .crossJoin(doubled.dropDuplicates("event_id")
        .agg(count(lit(1)).as("n_after")))
  }

  /** Time-series resample + gap-fill: per-user hourly buckets, a complete
    * hour spine from each user's first to last active hour (Spark
    * `sequence` / DuckDB `generate_series` — both end-inclusive), and
    * forward-filled running values over the gaps (`last(_, ignoreNulls)`
    * ≡ `last_value(... IGNORE NULLS)`). The per-bucket sum runs in
    * DECIMAL(18,2) so fill values are exact in both engines; epoch
    * arithmetic (`CAST(ts AS LONG) div 3600`) mirrors the tumbling
    * oracle's floor(epoch/width) reconstruction. Scale shape: the spine
    * explode and both windows are partitioned by user_id — no global
    * state, no SinglePartition exchange; spine length is bounded by each
    * user's own activity span. */
  def qResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val agg = Tables.df(spark, sfDir, "events")
      .filter($"user_id" % 50 === 0)
      // ts is TIMESTAMP_NTZ (no direct long cast); routing through LTZ in
      // the UTC session yields the same wall-clock epoch seconds
      .select($"user_id",
        (expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 3600") * 3600)
          .as("e"), $"value")
      .groupBy($"user_id", $"e")
      .agg(count(lit(1)).cast("int").as("n"),
        sum($"value".cast(DecimalType(18, 2))).as("sv"))
    val spine = agg.groupBy($"user_id")
      .agg(min($"e").as("e0"), max($"e").as("e1"))
      .select($"user_id",
        explode(sequence($"e0", $"e1", lit(3600L))).as("e"))
    val w = Window.partitionBy($"user_id").orderBy($"e")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("user_id", "e"), "left")
      .select($"user_id",
        timestamp_seconds($"e").cast("timestamp_ntz").as("h"),
        coalesce($"n", lit(0)).as("n"),
        last($"sv", ignoreNulls = true).over(w).cast("double")
          .as("filled_sum"),
        $"n".isNull.as("is_gap"))
      .orderBy($"user_id", $"h")
  }

  /** Last-touch attribution: every purchase is credited to the user's most
    * recent preceding click (any lookback), via an IGNORE NULLS last_value
    * over the per-user event order — the credit-assignment join of a
    * funnel pipeline without any self-join: one window pass, partitioned
    * by user. Gap is reported in exact epoch microseconds (both engines
    * floor nano fixtures to micros identically), so no datediff boundary
    * semantics are involved. */
  def qAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.df(spark, sfDir, "events")
      .withColumn("click_id",
        last(when($"event_type" === "click", $"event_id"), ignoreNulls = true)
          .over(w))
      .withColumn("click_ts",
        last(when($"event_type" === "click", $"ts"), ignoreNulls = true)
          .over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"click_id",
        (unix_micros($"ts".cast("timestamp"))
          - unix_micros($"click_ts".cast("timestamp"))).as("gap_us"))
      .orderBy($"event_id")
  }

  /** Batch twin of [[graft.streaming.Streams.AnomalyProcessor]]: every
    * event scores against the running mean/std of the events BEFORE it in
    * its type's (ts, event_id) order — identical semantics to the
    * streaming Welford detector (warm-up of 30, |z| > 3), expressed as
    * preceding-frame window aggregates. The running sums are of
    * once-rounded DECIMAL(18,6) values, so they are exact integers in
    * both engines regardless of how each engine incrementalizes its
    * frames, and mean/std/z derive from them with one shared double
    * formula. */
  def qAnomalyRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // tie order (ts, v, event_id) — not (ts, event_id) — so same-ts rows
    // process in the value order the streaming twin uses (TypedPoint has
    // no event_id); equal (ts, v) pairs yield the same output multiset
    // either way, so the twins stay in agreement
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts", $"v", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.df(spark, sfDir, "events")
      .select($"event_id", $"event_type", $"ts",
        round($"value", 6).cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("v"))
      .withColumn("np", count(lit(1)).over(w))
      .withColumn("sx", sum($"v").over(w))
      .withColumn("sx2", sum($"v" * $"v").over(w))
      .filter($"np" >= 30)
      .withColumn("vr",
        ($"sx2".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"np")
          / ($"np" - 1))
      // CASE-guarded sd: a zero-variance (or rounding-dipped-negative)
      // prefix must yield NULL z in BOTH engines — Spark would otherwise
      // emit Inf/NaN rows while DuckDB NULLs the division or THROWS on
      // sqrt(negative); NULL z fails the > 3 filter identically. The
      // streaming twin's `sd > 0` guard drops the same rows.
      .withColumn("sd", when($"vr" > 0, sqrt($"vr")))
      .withColumn("z", round(($"v".cast("double") - $"sx".cast("double") / $"np")
        / $"sd", 6))
      .filter(abs($"z") > 3.0)
      .select($"event_id", $"event_type", $"v".cast("double").as("value"),
        $"z", $"np".as("n_seen"))
      .orderBy($"event_id")
  }

  /** Behavior-LM training rows: for each event of the user_id%20 subset
    * with at least 5 predecessors, the previous 5 event types in time
    * order as a space-joined context string and the current type as the
    * next-event label — the sequence-model dataset assembly step
    * (session-based recommendation / next-action prediction). One lag()
    * window pass per user; no self-join, no collect; the (ts, event_id)
    * order is the same total order every event query in this pack uses. */
  def qSeqExamples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val lags = (1 to 5).map(i => lag($"event_type", i).over(w))
    Tables.df(spark, sfDir, "events")
      .filter($"user_id" % 20 === 0)
      .select($"user_id", $"event_id", $"event_type".as("label"),
        concat_ws(" ", lags.reverse: _*).as("context"),
        lags.last.isNotNull.as("full"))
      .filter($"full")
      .select($"user_id", $"event_id", $"context", $"label")
      .orderBy($"user_id", $"event_id")
  }

  /** The SCD-2 interval table (user_id, version, state, valid_from,
    * valid_to) — shared by [[qScd2]] and the point-in-time join. */
  private def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type".as("state"))
      .withColumn("prev", lag($"state", 1).over(byUser))
      .filter($"prev".isNull || $"prev" =!= $"state")
    changes
      .withColumn("valid_to", lead($"ts", 1).over(byUser))
      .withColumn("version", row_number().over(byUser))
      .select($"user_id", $"version", $"state",
        $"ts".as("valid_from"), $"valid_to")
  }

  /** Type-2 slowly-changing-dimension history from the event stream: each
    * user's event_type acts as the tracked attribute, and consecutive
    * CHANGES become versioned rows with [valid_from, valid_to) intervals
    * and an is_current flag — the standard warehouse temporal-dimension
    * build, as one window pass (lag to detect changes, lead on the change
    * rows to close intervals). No self-join, no MERGE loop; at scale this
    * is exactly how a daily SCD-2 rebuild runs over a partitioned log. */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    scd2History(spark, sfDir)
      .select($"user_id", $"version", $"state", $"valid_from", $"valid_to",
        $"valid_to".isNull.as("is_current"))
      .orderBy($"user_id", $"version")
  }

  // ---- q_pit_join --------------------------------------------------------
  /** Point-in-time enrichment: each purchase event joined to the SCD-2
    * state version valid AT its timestamp — the temporal join that keeps
    * training features leakage-free (a feature computed from a LATER
    * version would look into the future). The half-open [valid_from,
    * valid_to) intervals tile each user's timeline, so exactly one
    * version matches every probe. The join is an equi-join on user_id
    * with the interval containment as a join filter — it shuffles by key
    * and compares only within a user's few versions, never a nested loop
    * over the table. */
  def qPitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = scd2History(spark, sfDir)
      .select($"user_id".as("uid"), $"version", $"state",
        $"valid_from", $"valid_to")
    val probes = Tables.df(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    probes.join(h, $"user_id" === $"uid"
        && $"valid_from" <= $"ts"
        && ($"valid_to".isNull || $"ts" < $"valid_to"))
      .select($"event_id", $"user_id", $"ts",
        $"state".as("state_at_purchase"),
        $"version".as("state_version"),
        $"valid_from".as("state_since"))
      .orderBy($"event_id")
  }

  /** Ordered conversion funnel view → click → purchase with a 24-hour
    * conversion window: a user reaches stage k only via an event
    * strictly AFTER their stage-(k−1) entry time and within 24 h of it
    * (the classic sequential-pattern constraint a naive per-type min()
    * pivot gets wrong — a click that precedes every view must not
    * count). Formulated as three per-user aggregates chained by probe
    * joins: stage k's input is the one-event-type slice of the fact
    * table equi-joined to stage (k−1)'s thin (user, entry-time)
    * relation. Scale shape: each stage is one key-partitioned shuffle on
    * user_id over a type-pruned slice (the filter reaches the scan), the
    * stage relations shrink monotonically (150 → 60 → 25 users at
    * sf0.01), and the final report aggregates three 1-row summaries — no
    * window over the full fact table, no self-join of events with
    * events. Window test and gaps are exact epoch micros; the mean gap
    * is ONE double division of exact integers, rounded once to 6dp. */
  def qFunnelStaged(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val winUs = 24L * 3600 * 1000000
    def gapUs(a: Column, b: Column): Column =
      unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
    val ev = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id")
      .filter($"ts" > $"t1" && gapUs($"ts", $"t1") <= winUs)
      .groupBy($"user_id").agg(min($"ts").as("t2"), min($"t1").as("t1"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id")
      .filter($"ts" > $"t2" && gapUs($"ts", $"t2") <= winUs)
      .groupBy($"user_id").agg(min($"ts").as("t3"), min($"t2").as("t2"))
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit("view").as("step"), $"n_users",
        lit(null).cast("double").as("avg_gap_us"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
        round(sum(gapUs($"t2", $"t1")).cast("double") / count(lit(1)), 6)
          .as("avg_gap_us"))
      .select(lit(2L).as("stage"), lit("click").as("step"), $"n_users",
        $"avg_gap_us")
    val s3 = p.agg(count(lit(1)).as("n_users"),
        round(sum(gapUs($"t3", $"t2")).cast("double") / count(lit(1)), 6)
          .as("avg_gap_us"))
      .select(lit(3L).as("stage"), lit("purchase").as("step"), $"n_users",
        $"avg_gap_us")
    s1.unionAll(s2).unionAll(s3).orderBy($"stage")
  }

  /** The ordered view→click→purchase funnel evaluated WITHIN SESSIONS
    * (VERDICT r9 #7 — ties §2.10's session semantics to the funnel):
    * events sessionize per user with a 10-minute inactivity gap, and
    * each SESSION (not user) either reaches a stage in strict order or
    * doesn't — the "did one visit convert" question vs q_funnel_staged's
    * "did the user ever convert within 24 h". Session assignment is
    * gaps-and-islands: one lag() + one running sum, both in a single
    * user-partitioned window pass — semantically identical to
    * `session_window($"ts", gap)` (new session iff gap ≥ 10 min, the
    * same boundary rule; FunnelSessionSpec asserts the equivalence
    * against Streams.sessionize on the same events), but it labels every
    * EVENT with its session, which the aggregate form can't. The
    * tie-safety detail: the running sum uses the default RANGE frame, so
    * same-timestamp peers always land in the same session no matter how
    * the engine orders them. Downstream is the staged-gate shape of
    * q_funnel_staged keyed by (user, session): no self-join, no
    * time-window cap needed — the session bounds it. */
  // ---- q_split_temporal --------------------------------------------------
  /** Purged temporal train/test split with an embargo gap (the
    * time-series leak-prevention convention, cf. López de Prado 2018,
    * ch. 7): train strictly before the cutoff, test strictly after
    * cutoff + 24 h, the embargo day EXCLUDED so label windows that
    * straddle the cutoff cannot leak — the temporal counterpart to
    * q_split_leakproof's near-dup-cluster split. Per event type the
    * report carries the class balance AND the separation proof: the
    * latest train timestamp and earliest test timestamp, whose gap must
    * cover the embargo (spec-pinned).
    *
    * Scale shape: one scan, a per-row 3-way CASE on exact epoch-micros,
    * one (event_type)-keyed partial-agg. Nothing shuffles wider than the
    * type domain. */
  def qSplitTemporal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val testFrom = lit("2024-01-21 00:00:00").cast("timestamp")
    Tables.df(spark, sfDir, "events")
      .select($"event_type", $"ts".cast("timestamp").as("ts"))
      .select($"event_type", $"ts",
        when($"ts" < cutoff, "train")
          .when($"ts" >= testFrom, "test")
          .otherwise("embargo").as("split"))
      .groupBy($"event_type")
      .agg(
        sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when($"split" === "embargo", 1L).otherwise(0L))
          .as("n_embargo"),
        sum(when($"split" === "test", 1L).otherwise(0L)).as("n_test"),
        max(when($"split" === "train", $"ts")).as("train_max_ts"),
        min(when($"split" === "test", $"ts")).as("test_min_ts"))
      .orderBy($"event_type")
  }

  // ---- q_seq_mining ------------------------------------------------------
  /** Frequent contiguous 3-step sequential patterns over user event
    * histories (the sequence-database support convention of PrefixSpan,
    * Pei et al. '01, restricted to contiguous occurrences so the scan
    * is one window pass): each (a→b→c) pattern reports its support
    * (distinct USERS whose history contains it — a sequence counts
    * once however often it repeats the pattern), confidence against
    * its (a→b) prefix, and user coverage — where [[qMarkovChain]]
    * gives memoryless transition probabilities, this measures which
    * second-order paths actually recur across the population. (The
    * 10-minute session grain of q_journeys is deliberately NOT the
    * unit here: this fixture's users average one event per several
    * hours, so sessions are near-singletons and every ≥3-step pattern
    * would be support-1.)
    *
    * Scale shape: one 2-step lead pass (user-keyed window), then
    * everything is the types³-thin pattern relation: distinct-per-user,
    * two counts, a broadcast prefix join, and a distributed top-20. */
  def qSeqMining(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val led = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("b", lead($"event_type", 1).over(w))
      .withColumn("c", lead($"event_type", 2).over(w))
      .localCheckpoint() // one window pass shared by both supports
    val triSup = led.filter($"c".isNotNull)
      .select($"user_id", $"event_type".as("a"), $"b", $"c")
      .distinct()
      .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("support"))
    val biSup = led.filter($"b".isNotNull)
      .select($"user_id", $"event_type".as("a"), $"b")
      .distinct()
      .groupBy($"a", $"b").agg(count(lit(1)).as("sup_ab"))
    val nUsers = led.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    triSup.filter($"support" >= 5)
      .join(broadcast(biSup), Seq("a", "b"))
      .crossJoin(broadcast(nUsers))
      .select($"a", $"b", $"c", $"support",
        round($"support".cast("double") / $"sup_ab", 6).as("confidence"),
        round($"support".cast("double") / $"n_users", 6).as("coverage"))
      .orderBy($"support".desc, $"a", $"b", $"c")
      .limit(20)
  }

  // ---- q_interarrival ----------------------------------------------------
  /** Per-event-type interarrival fit — the Poissonness check behind
    * capacity planning and anomaly thresholds: per (user, type) stream,
    * the gaps between consecutive events (exact microsecond integers),
    * their exponential-MLE rate λ̂ = 1/mean, and the coefficient of
    * variation (a Poisson process has CV = 1; CV ≫ 1 is burstiness, the
    * same diagnosis q_burstiness makes for term counts). All moments
    * are exact integer sums of microsecond gaps; mean/CV/λ are one
    * shared double formula. Shape: one user/type-keyed window pass →
    * a types-thin aggregate. */
  def qInterarrival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    val gaps = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .withColumn("prev", lag($"ts", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"event_type",
        (unix_micros($"ts".cast("timestamp"))
          - unix_micros($"prev".cast("timestamp"))).as("g"))
    // g² would overflow BIGINT at ~day-scale microsecond gaps — the
    // squares multiply and sum as DECIMAL(38,0), exact at any horizon
    val dec38 = DecimalType(38, 0)
    val s = gaps.groupBy($"event_type").agg(
      count(lit(1)).as("n_gaps"),
      sum($"g").as("sg"),
      sum($"g".cast(dec38) * $"g".cast(dec38)).as("sgg"))
    val nd = $"n_gaps".cast("double")
    val mean = $"sg".cast("double") / nd
    val varg = $"sgg".cast("double") / nd - mean * mean
    val cv = sqrt(varg) / mean
    s.select($"event_type", $"n_gaps",
      round(mean / 1000000.0, 3).as("mean_gap_s"),
      round(cv, 6).as("cv"),
      round(lit(3600.0 * 1000000.0) / mean, 4).as("rate_per_hour"),
      (cv > 1.2).as("bursty"))
      .orderBy($"event_type")
  }

  // ---- q_journeys --------------------------------------------------------
  /** Session journey mining — the top-25 most common event-type paths
    * through a visit (the "what do users actually do" report behind
    * funnel design; the funnel ops test a HYPOTHESIZED path, this one
    * discovers paths). Sessions are the same 10-minute-gap islands as
    * q_funnel_sessions; a session's path is its strictly-ordered
    * event-type sequence joined with '>'.
    *
    * Scale shape: one user-partitioned window pass sessionizes (lag +
    * running sum, the gaps-and-islands form), one (user, session)
    * aggregate folds each session's path (collect bounded by session
    * length — gap-bounded by construction), one vocabulary-thin path
    * count, and a distributed top-25 (TakeOrderedAndProject). Ties are
    * impossible to mis-order: events sort by (ts, event_id) on both
    * engines. */
  def qJourneys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 10L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paths = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_s", when($"prev".isNull
          || unix_micros($"ts".cast("timestamp"))
            - unix_micros($"prev".cast("timestamp")) >= gapUs, 1L)
        .otherwise(0L))
      .withColumn("sid", sum($"new_s").over(w))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("steps"),
        array_join(
          transform(
            array_sort(collect_list(struct($"ts", $"event_id",
              $"event_type"))),
            x => x("event_type")),
          ">").as("path"))
    paths.groupBy($"path", $"steps")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(25)
      .select($"path", $"steps", $"n_sessions")
  }

  def qFunnelSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 10L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val ev = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"ts")
    val s = ev
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_s", when($"prev".isNull
          || unix_micros($"ts".cast("timestamp"))
            - unix_micros($"prev".cast("timestamp")) >= gapUs, 1L)
        .otherwise(0L))
      .withColumn("sid", sum($"new_s").over(w))
      .select($"user_id", $"sid", $"event_type", $"ts")
      // referenced by all three stage gates below — materialize so the
      // sessionization window pass runs ONCE, not once per stage
      // (PlanAuditSpec counts the Window operators)
      .localCheckpoint()
    def gapCol(a: Column, b: Column): Column =
      unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
    val v = s.filter($"event_type" === "view")
      .groupBy($"user_id", $"sid").agg(min($"ts").as("t1"))
    val c = s.filter($"event_type" === "click")
      .join(v, Seq("user_id", "sid"))
      .filter($"ts" > $"t1")
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("t2"), min($"t1").as("t1"))
    val p = s.filter($"event_type" === "purchase")
      .join(c, Seq("user_id", "sid"))
      .filter($"ts" > $"t2")
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("t3"), min($"t2").as("t2"))
    val s1 = v.agg(count(lit(1)).as("n_sessions"))
      .select(lit(1L).as("stage"), lit("view").as("step"), $"n_sessions",
        lit(null).cast("double").as("avg_gap_us"))
    val s2 = c.agg(count(lit(1)).as("n_sessions"),
        round(sum(gapCol($"t2", $"t1")).cast("double") / count(lit(1)), 6)
          .as("avg_gap_us"))
      .select(lit(2L).as("stage"), lit("click").as("step"), $"n_sessions",
        $"avg_gap_us")
    val s3 = p.agg(count(lit(1)).as("n_sessions"),
        round(sum(gapCol($"t3", $"t2")).cast("double") / count(lit(1)), 6)
          .as("avg_gap_us"))
      .select(lit(3L).as("stage"), lit("purchase").as("step"), $"n_sessions",
        $"avg_gap_us")
    s1.unionAll(s2).unionAll(s3).orderBy($"stage")
  }

  /** Two-proportion A/B significance test on daily conversion (did a
    * user-day contain a purchase), variants assigned by user-id parity —
    * the experiment read-out every event pipeline ends in. The unit is
    * the USER-DAY, not the user: over the fixture's span every user
    * eventually purchases (lifetime conversion saturates at 1.0, making
    * the pooled standard error exactly 0), so the daily rate is the
    * well-posed metric — and the degenerate case stays guarded anyway
    * (zero SE → NULL z, mirrored in the oracle, the qBatchPadding
    * zero-guard pattern). Scale shape: one (user, day)-keyed
    * partial-aggregable groupBy collapses the event log, then ONE
    * conditional 1-row aggregate carries all four arm counts — no
    * per-arm scan, no join; z (pooled SE) is closed-form arithmetic on
    * that single row. Determinism: counts are exact integers; p̂ / z are
    * one shared IEEE double formula rounded once (the significance flag
    * compares the UNROUNDED |z| in both engines). */
  def qAbtest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val units = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(($"user_id" % 2 === 0).as("a"), $"conv")
    val s = units.agg(
      sum(when($"a", 1L).otherwise(0L)).as("n_a"),
      sum(when($"a", $"conv").otherwise(0L)).as("c_a"),
      sum(when(!$"a", 1L).otherwise(0L)).as("n_b"),
      sum(when(!$"a", $"conv").otherwise(0L)).as("c_b"))
    val pa = $"c_a".cast("double") / $"n_a"
    val pb = $"c_b".cast("double") / $"n_b"
    val pp = ($"c_a" + $"c_b").cast("double") / ($"n_a" + $"n_b")
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")
    val z = when(se2 === 0.0, lit(null).cast("double"))
      .otherwise((pa - pb) / sqrt(se2))
    s.select($"n_a", $"c_a", $"n_b", $"c_b",
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round(z, 6).as("z"), (abs(z) > 1.96).as("significant"))
  }

  /** Offline (counterfactual) policy evaluation by inverse-propensity
    * scoring — the bandit/RLHF-adjacent read-out: "what would the reward
    * have been under a DIFFERENT action policy than the one that logged
    * this data?" (Horvitz–Thompson IPS + the self-normalized SNIPS
    * variant, Swaminathan & Joachims '15). Context = the props.k feature
    * quartile; the target policy is LEARNED on the even-event half
    * (argmax mean reward per context) and evaluated on the odd-event
    * half with empirical propensities — a proper split, so the estimate
    * never grades the half it was fit on. Scale shape: the learned
    * policy (4 rows) and the propensity table (20 rows) broadcast into
    * ONE projection over the eval scan; per-row IPS terms round to
    * DECIMAL(18,6) before the per-context sums, so the estimates are
    * exact and order-independent in both engines. */
  def qOfflineEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec6 = DecimalType(18, 6)
    val ev = Tables.df(spark, sfDir, "events")
      .select($"event_id",
        // integer floor-div on both sides (DuckDB's double→INT cast
        // ROUNDS, so a `/ 25` quotient would bucket 99 into 4, not 3)
        expr("CAST(get_json_object(props, '$.k') AS INT) div 25")
          .cast("int").as("ctx"),
        $"event_type".as("action"),
        $"value".cast(DecimalType(18, 2)).as("r"))
    val learn = ev.filter($"event_id" % 2 === 0)
    val eval_ = ev.filter($"event_id" % 2 === 1)
    val pi = learn.groupBy($"ctx", $"action")
      .agg(round(sum($"r").cast("double") / count(lit(1)), 6).as("m"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"ctx").orderBy($"m".desc, $"action".asc)))
      .filter($"rk" === 1)
      .select($"ctx", $"action".as("pi_action"))
    val nx = eval_.groupBy($"ctx").agg(count(lit(1)).as("n_x"))
    val nax = eval_.groupBy($"ctx", $"action")
      .agg(count(lit(1)).as("n_ax"))
    eval_
      .join(broadcast(pi), "ctx")
      .join(broadcast(nax), Seq("ctx", "action"))
      .join(broadcast(nx), "ctx")
      .withColumn("matched", $"action" === $"pi_action")
      .withColumn("w",
        when($"matched", $"n_x".cast("double") / $"n_ax").otherwise(0.0))
      .groupBy($"ctx", $"pi_action")
      .agg(count(lit(1)).as("n_eval"),
        sum(when($"matched", 1L).otherwise(0L)).as("n_match"),
        sum($"r").as("logged_sum"),
        sum(round($"r".cast("double") * $"w", 6).cast(dec6)).as("ips_sum"),
        sum(round($"w", 6).cast(dec6)).as("w_sum"))
      .select($"ctx", $"pi_action", $"n_eval", $"n_match",
        round($"logged_sum".cast("double") / $"n_eval", 6).as("logged_avg"),
        round($"ips_sum".cast("double") / $"n_eval", 6).as("ips_value"),
        // zero-guard (qBatchPadding pattern): a context whose learned
        // action never occurs in the eval half has w_sum = 0
        when($"w_sum" === 0, lit(null).cast("double"))
          .otherwise(round($"ips_sum".cast("double")
            / $"w_sum".cast("double"), 6)).as("snips_value"))
      .orderBy($"ctx")
  }

  /** Kaplan–Meier user-survival curve over the events stream: per-user
    * lifetime = days between first and last activity; a user whose last
    * activity is more than 7 days before the corpus's final timestamp has
    * churned (the "death"), otherwise they are right-censored at their
    * observed lifetime. The product-limit estimator S(t) = Π(1 − d/n) is
    * computed as exp of a cumulative sum of once-rounded ln(1 − d/n)
    * DECIMAL(18,9) terms (the decimal-pre-sum discipline — both engines
    * carry identical values), with the d = n full-absorption step
    * short-circuited to exactly 0 so ln(0) never evaluates. Scale: one
    * groupBy(user_id) pass reduces the stream to user granularity;
    * everything after runs on the distinct-lifetime relation, bounded by
    * the calendar span in days — genuinely tiny at any corpus scale, so
    * the unpartitioned cumulative window is safe by construction. */
  def qSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    survivalCurve(spark, sfDir).orderBy($"t")
  }

  // ---- q_cox_score ---------------------------------------------------------
  /** Cox proportional-hazards regression ('72) at the score-test point:
    * U(0) and I(0) of the partial likelihood for the binary user-parity
    * covariate on TIME-TO-FIRST-PURCHASE (days from a user's first
    * event to their first purchase — the conversion-latency endpoint;
    * on this fixture every user converts, so the sample is fully
    * observed and the estimator is the complete-data Cox fit — stated,
    * not hidden: the q_survival churn endpoint has ZERO events at
    * sf0.1's activity density), plus the one-step estimator β̂ = U/I,
    * the hazard ratio e^β̂, and the score χ² vs 3.841 — the REGRESSION
    * member of the survival family: q_logrank asks "do the groups
    * differ", this says by how much per unit covariate (for binary x
    * the score test IS the log-rank test). Risk sets never
    * materialize: S0(t)/S1(t) are suffix sums over the day-grain
    * latency relation (calendar-bounded — the q_survival argument),
    * Breslow ties at β = 0; 9dp once-rounded score/information terms
    * into exact decimal sums. */
  def qCoxScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val users = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(min($"ts").as("first_ts"),
        min(when($"event_type" === "purchase", $"ts")).as("purch_ts"))
      .filter($"purch_ts".isNotNull)
      .select(
        datediff(to_date($"purch_ts"), to_date($"first_ts")).as("t"),
        ($"user_id" % 2).cast("long").as("x"))
    // fully observed ⇒ deaths at t are exactly the arrivals at t
    val byT = users.groupBy($"t")
      .agg(count(lit(1)).as("m_all"), sum($"x").as("mx_all"))
      .select($"t", $"m_all", $"mx_all",
        $"m_all".as("d"), $"mx_all".as("dx"))
    // suffix sums as t-DESCENDING running sums (r22 — the r21
    // q_knn_shapley O(rows²)-frame fix applied to the last two suffix
    // frames): Spark's [currentRow, unboundedFollowing] frame
    // re-aggregates the partition remainder per row (O(rows²)); t is
    // unique (the groupBy grain), so the running prefix under ORDER BY
    // t DESC covers the identical row set {t' ≥ t}, and m_all/mx_all
    // sum as exact LONGs ⇒ order-independent ⇒ byte-identical risk sets.
    // The day-grain relation is calendar-bounded, so this is frame
    // hygiene, not a scale fix — but it retires the O(n²) frame class.
    val wSuf = Window.orderBy($"t".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = byT
      .withColumn("s0", sum($"m_all").over(wSuf))
      .withColumn("s1", sum($"mx_all").over(wSuf))
      .filter($"d" > 0)
      .select(
        round($"dx" - $"d" * ($"s1".cast("double") / $"s0"), 9)
          .cast(dec9).as("u_t"),
        round($"d" * ($"s1".cast("double") / $"s0")
          * (lit(1.0) - $"s1".cast("double") / $"s0"), 9)
          .cast(dec9).as("i_t"))
    // n_events = Σd over the day grain; under complete observation (the
    // stated estimator assumption above) it EQUALS n_users, but deriving
    // it from the death counts keeps the two columns meaning what they
    // say instead of duplicating one aggregate under two names
    val nU = users.agg(count(lit(1)).as("n_users"))
      .crossJoin(byT.agg(sum($"d").as("n_events")))
    terms.agg(sum($"u_t").as("u"), sum($"i_t").as("i"))
      .crossJoin(broadcast(nU))
      .select($"n_users", $"n_events",
        round($"u".cast("double"), 6).as("score_u"),
        round($"i".cast("double"), 6).as("info_i"),
        when($"i" > 0, round($"u".cast("double")
          / $"i".cast("double"), 6)).as("beta"),
        when($"i" > 0, round(exp($"u".cast("double")
          / $"i".cast("double")), 6)).as("hazard_ratio"),
        when($"i" > 0, round($"u".cast("double") * $"u".cast("double")
          / $"i".cast("double"), 6)).as("score_chi2"))
      .withColumn("sig_05",
        when($"score_chi2".isNotNull, $"score_chi2" > 3.841))
  }

  // ---- q_did -------------------------------------------------------------
  /** Difference-in-differences (the two-group × two-period experiment
    * readout, Card & Krueger '94 usage): DiD = (ȳ treat,post − ȳ
    * treat,pre) − (ȳ ctrl,post − ȳ ctrl,pre) on user-day conversion,
    * arms by user parity, periods split at the observed date midpoint —
    * the estimator that nets out both the level difference between arms
    * and the common time trend, which q_abtest's single-period z cannot.
    * SE from the four cells' binomial variances; the parity
    * pseudo-treatment pins the null. One (user, day) reduction → one
    * 8-conditional-sum aggregate; all counts exact integers. */
  def qDid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val units = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(($"user_id" % 2 === 0).as("a"), $"day", $"conv")
    val lim = units.agg(min($"day").as("d0"), max($"day").as("d1"))
    val cells = units.crossJoin(broadcast(lim))
      .select($"a",
        (datediff($"day", $"d0")
          > expr("datediff(d1, d0) div 2")).as("late"), $"conv")
    val s = cells.agg(
      sum(when(!$"a" && !$"late", 1L).otherwise(0L)).as("n00"),
      sum(when(!$"a" && !$"late", $"conv").otherwise(0L)).as("c00"),
      sum(when(!$"a" && $"late", 1L).otherwise(0L)).as("n01"),
      sum(when(!$"a" && $"late", $"conv").otherwise(0L)).as("c01"),
      sum(when($"a" && !$"late", 1L).otherwise(0L)).as("n10"),
      sum(when($"a" && !$"late", $"conv").otherwise(0L)).as("c10"),
      sum(when($"a" && $"late", 1L).otherwise(0L)).as("n11"),
      sum(when($"a" && $"late", $"conv").otherwise(0L)).as("c11"))
    def p(c: Column, n: Column): Column = c.cast("double") / n
    val did = (p($"c11", $"n11") - p($"c10", $"n10"))
      .minus(p($"c01", $"n01") - p($"c00", $"n00"))
    def vr(c: Column, n: Column): Column =
      p(c, n) * (lit(1.0) - p(c, n)) / n
    val se = sqrt(vr($"c00", $"n00") + vr($"c01", $"n01")
      + vr($"c10", $"n10") + vr($"c11", $"n11"))
    val z = when(se > 0.0, did / se)
    s.select($"n00", $"n01", $"n10", $"n11",
      round(p($"c00", $"n00"), 6).as("p_ctrl_pre"),
      round(p($"c01", $"n01"), 6).as("p_ctrl_post"),
      round(p($"c10", $"n10"), 6).as("p_treat_pre"),
      round(p($"c11", $"n11"), 6).as("p_treat_post"),
      round(did, 6).as("did"), round(se, 6).as("se"),
      round(z, 6).as("z"), (abs(z) > 1.96).as("significant"))
  }

  // ---- q_logrank ---------------------------------------------------------
  /** Log-rank test (Mantel '66) comparing the two parity arms'
    * time-to-first-purchase curves — the hypothesis test that belongs
    * beside [[qSurvival]]'s K-M estimate (an experiment that shifts
    * conversion TIMING shows up here long before a means test sees
    * it): at every pooled conversion day, the observed arm-1
    * conversions are compared to their hypergeometric expectation
    * given the at-risk sets, and z = Σ(O−E)/√ΣV. (Time-to-event is
    * first-purchase rather than q_survival's 7-day churn rule — on
    * this fixture every user stays active, so the churn event never
    * fires and a churn log-rank would be vacuous.) Never-purchasers
    * censor at their last activity. At-risk counts come from
    * cumulative sums over the day-thin time relation; the per-time E
    * and V terms round to DECIMAL(18,9) before their exact sums. */
  def qLogrank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val ev = Tables.df(spark, sfDir, "events")
    val users = ev.groupBy($"user_id")
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"),
        min(when($"event_type" === "purchase", $"ts")).as("p_ts"))
      .select(($"user_id" % 2 === 0).as("a"),
        datediff(to_date(coalesce($"p_ts", $"last_ts")),
          to_date($"first_ts")).as("t"),
        $"p_ts".isNotNull.as("churned"))
    val byT = users.groupBy($"t").agg(
      count(lit(1)).as("m_all"),
      sum(when($"churned", 1L).otherwise(0L)).as("d_all"),
      sum(when($"a", 1L).otherwise(0L)).as("m_1"),
      sum(when($"a" && $"churned", 1L).otherwise(0L)).as("d_1"))
    val totals = users.agg(count(lit(1)).as("n_users"),
      sum(when($"a", 1L).otherwise(0L)).as("n1_users"))
    val wPrev = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risks = byT.crossJoin(broadcast(totals))
      .withColumn("n_risk",
        $"n_users" - coalesce(sum($"m_all").over(wPrev), lit(0L)))
      .withColumn("n1_risk",
        $"n1_users" - coalesce(sum($"m_1").over(wPrev), lit(0L)))
      .filter($"d_all" > 0)
    val r = $"n1_risk".cast("double") / $"n_risk"
    val terms = risks.select($"d_1",
      round($"d_all".cast("double") * $"n1_risk" / $"n_risk", 9)
        .cast(dec9).as("e1"),
      when($"n_risk" > 1,
        round($"d_all".cast("double") * r * (lit(1.0) - r)
          * (($"n_risk" - $"d_all").cast("double")
            / ($"n_risk" - lit(1L))), 9).cast(dec9))
        .otherwise(lit(0).cast(dec9)).as("v"))
    val s = terms.agg(count(lit(1)).as("n_times"),
      sum($"d_1").as("o1"), sum($"e1").as("e1"), sum($"v").as("v"))
    val z = when($"v" > 0,
      ($"o1".cast("double") - $"e1".cast("double"))
        / sqrt($"v".cast("double")))
    s.select($"n_times", $"o1".as("observed_1"),
      round($"e1".cast("double"), 4).as("expected_1"),
      round($"v".cast("double"), 4).as("variance"),
      round(z, 6).as("z"), round(z * z, 6).as("chi2"),
      (abs(z) > 1.96).as("significant"))
  }

  /** The K-M curve relation (t, n_risk, d_churned, c_censored,
    * survival) — shared by [[qSurvival]] and [[qLtv]]. */
  /** The pre-curve K-M relation (t, m_all, d, n_risk, term, absorbed) —
    * shared by [[survivalCurve]] and [[qKmCi]] so the CI's ingredients
    * provably come from the same estimator. */
  private def survivalBase(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val ev = Tables.df(spark, sfDir, "events")
    val horizon = ev.agg(max($"ts").as("max_ts"))
    val users = ev.groupBy($"user_id")
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
      .crossJoin(broadcast(horizon))
      .select($"user_id",
        datediff(to_date($"last_ts"), to_date($"first_ts")).as("t"),
        ($"last_ts" < expr("max_ts - INTERVAL 7 DAY")).as("churned"))
    val byT = users.groupBy($"t")
      .agg(count(lit(1)).as("m_all"),
        sum(when($"churned", 1L).otherwise(0L)).as("d"))
    val nUsers = users.agg(count(lit(1)).as("n_users"))
    val wPrev = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(nUsers))
      .withColumn("n_risk",
        $"n_users" - coalesce(sum($"m_all").over(wPrev), lit(0L)))
      .withColumn("term",
        when($"d" < $"n_risk",
          round(log(lit(1.0) - $"d".cast("double") / $"n_risk"), 9)
            .cast(dec9))
          .otherwise(lit(null).cast(dec9)))
      .withColumn("absorbed",
        max(($"d" === $"n_risk").cast("int")).over(wCum))
  }

  /** The survival column expression over [[survivalBase]]'s cumulative
    * window — one home for the curve arithmetic. */
  private def survivalCol: Column = {
    val dec9 = DecimalType(18, 9)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    when(col("absorbed") === 1, 0.0)
      .otherwise(round(exp(
        sum(coalesce(col("term"), lit(0).cast(dec9))).over(wCum)
          .cast("double")), 6))
  }

  private[graft] def survivalCurve(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    survivalBase(spark, sfDir)
      .select($"t", $"n_risk", $"d".as("d_churned"),
        ($"m_all" - $"d").as("c_censored"),
        survivalCol.as("survival"))
  }

  // ---- q_km_ci -------------------------------------------------------------
  /** Greenwood confidence bands for the Kaplan–Meier curve (Greenwood
    * '26): Var(Ŝ(t)) = Ŝ(t)²·Σ_{i≤t} d_i/(n_i(n_i−d_i)), 95% linear CI
    * clamped to [0, 1] — the uncertainty every survival plot ships and
    * q_survival's point curve omits. Shares [[survivalBase]] verbatim,
    * so the band provably brackets the SAME estimator; Greenwood terms
    * round once to 12dp decimals (they are ~1/n², far below the 9dp
    * grid) and accumulate exactly; the band arithmetic is one shared
    * double form off the already-6dp-rounded survival column. Windows
    * run over the day-grain (calendar-bounded) curve relation. */
  def qKmCi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec12 = DecimalType(18, 12)
    val wCum = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withGw = survivalBase(spark, sfDir)
      .withColumn("gwt",
        when($"d" < $"n_risk",
          round($"d".cast("double")
            / ($"n_risk".cast("double") * ($"n_risk" - $"d")), 12)
            .cast(dec12))
          .otherwise(lit(null).cast(dec12)))
      .withColumn("gw",
        sum(coalesce($"gwt", lit(0).cast(dec12))).over(wCum))
      .withColumn("survival", survivalCol)
    val se = $"survival" * sqrt($"gw".cast("double"))
    withGw.select($"t", $"n_risk", $"d".as("d_churned"), $"survival",
        round(se, 6).as("se"),
        round(greatest($"survival" - lit(1.959964) * se, lit(0.0)), 6)
          .as("ci_lo"),
        round(least($"survival" + lit(1.959964) * se, lit(1.0)), 6)
          .as("ci_hi"))
      .orderBy($"t")
  }

  /** Lifetime-value projection from the operators composing: expected
    * remaining active days E[T] = Σ_t S(t) off the K-M curve
    * (day-granularity trapezoid omitted deliberately — a planning
    * proxy, labeled as such), times the observed revenue per active
    * user-day — the back-of-envelope LTV a growth model starts from,
    * with each ingredient separately reported and separately
    * oracle-checked upstream (q_survival, the purchase stream). */
  def qLtv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec6 = DecimalType(18, 6)
    val exp_ = survivalCurve(spark, sfDir)
      .agg(sum($"survival".cast(dec6)).as("sd"),
        count(lit(1)).as("n_steps"))
      .select(round($"sd".cast("double"), 6).as("exp_days"), $"n_steps")
    val ev = Tables.df(spark, sfDir, "events")
    val rev = ev.filter($"event_type" === "purchase")
      .agg(sum($"value".cast(DecimalType(18, 2))).as("v"))
    val ud = ev.select($"user_id", to_date($"ts").as("d")).distinct()
      .agg(count(lit(1)).as("user_days"))
    exp_.crossJoin(broadcast(rev)).crossJoin(broadcast(ud))
      .select($"n_steps", $"exp_days", $"user_days",
        round($"v".cast("double"), 2).as("total_rev"),
        round($"v".cast("double") / $"user_days", 6).as("rev_per_ud"))
      .select($"n_steps", $"exp_days", $"user_days", $"total_rev",
        $"rev_per_ud",
        round($"exp_days" * $"rev_per_ud", 6).as("ltv_proxy"))
  }

  /** Hour-of-day seasonality profile per event type: observed count vs
    * the independence expectation, reported as a lift-style seasonal
    * index n·N / (n_type·n_hour) — the load-shape read a pipeline
    * scheduler uses to place batch work off-peak. One pass to the
    * type×24 cell relation (localCheckpointed — it feeds both marginals
    * and the final join); everything after is constant-sized. */
  def qSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.df(spark, sfDir, "events")
      .select($"event_type", hour($"ts").as("hr"))
      .groupBy($"event_type", $"hr").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val byType = cells.groupBy($"event_type").agg(sum($"n").as("n_type"))
    val byHr = cells.groupBy($"hr").agg(sum($"n").as("n_hr"))
    val tot = byType.agg(sum($"n_type").as("n_all"))
    cells.join(broadcast(byType), "event_type")
      .join(broadcast(byHr), "hr")
      .crossJoin(broadcast(tot))
      .select($"event_type", $"hr", $"n",
        // n_type·n_hr casts a factor to double first (ADVICE r10 #3's
        // overflow pattern): both are corpus-scale BIGINTs whose product
        // overflows LONG long before either marginal does
        round($"n".cast("double") * $"n_all"
          / ($"n_type".cast("double") * $"n_hr"), 6)
          .as("idx"))
      .orderBy($"event_type", $"hr")
  }

  /** Discounted returns + advantages over logged user-day episodes — the
    * RL-from-logs primitive (compute G_t = Σ γ^k r_{t+k} and A_t = G_t −
    * V(s_t) over trajectories) expressed as windows: reward = purchase
    * value, γ = 0.9 per step, suffix-summed as exact decimals via
    * G_t = (Σ_{k≥t} γ^k·r_k) / γ^t so ONE ordered window pass per
    * episode computes every step's return (γ^k rounded once to
    * DECIMAL(18,9), products exact, one double division per row). The
    * baseline is the tabular per-event-type mean return; the report is
    * the per-type advantage summary. Scale: windows partition by
    * (user, day) — bounded episodes — and the baseline join broadcasts
    * a #types-row relation into the scan. */
  def qReturns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec2 = DecimalType(18, 2)
    val dec6 = DecimalType(18, 6)
    val dec9 = DecimalType(18, 9)
    val w = Window.partitionBy($"user_id", $"d").orderBy($"ts", $"event_id")
    // suffix frame KEPT as [currentRow, unboundedFollowing] (r22,
    // measured): the q_knn_shapley descending-running-sum rewrite was
    // tried and REVERTED — this query's other window functions share
    // w's ASCENDING sort, so the reversed order broke the single-sort
    // WindowExec fusion into two sorts + two window passes (q_returns
    // 0.95→1.20 s wall, run 2.5→4.4 core-s on matched windows), while
    // the frame's O(rows²) is bounded by the per-(user, day) episode
    // length (~tens of rows at any corpus size — more users, not longer
    // days) and costs less than the second sort.
    val wSuf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val steps = Tables.df(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").as("d"), $"ts", $"event_id",
        $"event_type",
        when($"event_type" === "purchase", $"value".cast(dec2))
          .otherwise(lit(0).cast(dec2)).as("r"))
      .withColumn("k", row_number().over(w) - 1)
      .withColumn("gk", round(pow(lit(0.9), $"k"), 9).cast(dec9))
      // ADVICE r10 #1: γ^k rounded to DECIMAL(18,9) is exactly 0 for
      // k >= 204 (0.9^204 < 0.5e-9), so suf/gk would divide by zero and
      // poison the per-type aggregates with Inf/NaN. Steps beyond the
      // representable discount horizon carry ~0 return mass by definition;
      // drop them (mirrored by the oracle's WHERE gk > 0). The episode-
      // length bound this query assumes is therefore k < 204 per user-day.
      .filter($"gk" > lit(0).cast(dec9))
      .withColumn("suf", sum($"gk" * $"r").over(wSuf))
      .select($"event_type",
        round($"suf".cast("double") / $"gk".cast("double"), 6).as("g"))
    val base = steps.groupBy($"event_type")
      .agg(count(lit(1)).as("n_steps"),
        round(sum($"g".cast(dec6)).cast("double") / count(lit(1)), 6)
          .as("baseline"))
    steps.join(broadcast(base), "event_type")
      .select($"event_type", $"n_steps", $"baseline",
        round($"g" - $"baseline", 6).as("adv"))
      .groupBy($"event_type", $"n_steps", $"baseline")
      .agg(min($"adv").as("min_adv"), max($"adv").as("max_adv"),
        round(sum(abs($"adv").cast(dec6)).cast("double") / count(lit(1)), 6)
          .as("mean_abs_adv"))
      .orderBy($"event_type")
  }

  /** U-shaped (position-based 40/20/40) multi-touch attribution — the
    * companion to [[qAttribution]]'s last-touch rule: every purchase
    * splits its value across the view/click touches earlier in the same
    * user-day — 40% to the first touch, 40% to the last, the middle 20%
    * evenly across interior touches (1 touch → 100%, 2 → 50/50).
    * Purchases with no prior touch report under channel 'none'. Credits
    * round to DECIMAL(18,9) and credited money to DECIMAL(18,6) before
    * the channel sums (exact, order-independent). Scale: the
    * purchase×touch join keys on (user, day) with a timestamp residual
    * — fan-out bounded by per-user-day activity, the same envelope as
    * q_returns' episodes. */
  def qAttributionU(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec2 = DecimalType(18, 2)
    val dec6 = DecimalType(18, 6)
    val dec9 = DecimalType(18, 9)
    val ev = Tables.df(spark, sfDir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", to_date($"ts").as("d"), $"ts".as("p_ts"),
        $"event_id".as("p_id"), $"value".cast(dec2).as("v"))
    val touches = ev.filter($"event_type".isin("view", "click"))
      .select($"user_id", to_date($"ts").as("d"), $"ts".as("t_ts"),
        $"event_id".as("t_id"), $"event_type".as("channel"))
    val joined = purchases.join(touches, Seq("user_id", "d"))
      .filter($"t_ts" < $"p_ts")
    val wAsc = Window.partitionBy($"p_id").orderBy($"t_ts", $"t_id")
    val credited = joined
      .withColumn("k", row_number().over(wAsc))
      .withColumn("n_t", count(lit(1)).over(Window.partitionBy($"p_id")))
      .withColumn("credit", round(
        when($"n_t" === 1, lit(1.0))
          .when($"n_t" === 2, lit(0.5))
          .when($"k" === 1 || $"k" === $"n_t", lit(0.4))
          .otherwise(lit(0.2) / ($"n_t" - 2)), 9).cast(dec9))
      .select($"p_id", $"channel", $"v", $"credit")
    val attributed = credited.groupBy($"channel")
      .agg(count(lit(1)).as("n_events"),
        sum(round(($"credit" * $"v").cast("double"), 6).cast(dec6))
          .as("cv"))
      .select($"channel", $"n_events",
        round($"cv".cast("double"), 6).as("value_credited"))
    val unattributed = purchases
      .join(credited.select($"p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_events"), sum($"v").as("cv"))
      .select(lit("none").as("channel"), $"n_events",
        round(coalesce($"cv".cast("double"), lit(0.0)), 6)
          .as("value_credited"))
    attributed.unionAll(unattributed).orderBy($"channel")
  }

  /** Propensity-score stratification for observational treatment-effect
    * estimation (Rosenbaum & Rubin '83): a frozen logistic over user
    * activity scores each user's propensity for the deterministic
    * "exposure" (user-id parity — a synthetic treatment whose true
    * effect is zero, which the spec pins: within-stratum outcome
    * differences must be statistically small), users stratify on exact
    * score quintiles (the q_rfm percentile-cuts pattern — no global
    * ntile), and the report gives the within-stratum treated/control
    * conversion contrast with its stratum weight. Zero-arm strata yield
    * NULL contrasts on both engines. */
  def qPropensity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_ev"),
        max(when($"event_type" === "purchase", 1).otherwise(0)).as("y"))
      .withColumn("treated", $"user_id" % 2 === 0)
      .withColumn("score", round(lit(1.0)
        / (lit(1.0) + exp((lit(20.0) - $"n_ev") / lit(10.0))), 6))
      .localCheckpoint() // user-thin; feeds cuts + stratification
    val cuts = users.agg(
      expr("transform(percentile(score, array(0.2, 0.4, 0.6, 0.8))," +
        " x -> round(x, 6))").as("sc"))
    val tot = users.agg(count(lit(1)).as("n_all"))
    users.crossJoin(broadcast(cuts))
      .select($"treated", $"y",
        (lit(1) + ($"score" > element_at($"sc", 1)).cast("int")
          + ($"score" > element_at($"sc", 2)).cast("int")
          + ($"score" > element_at($"sc", 3)).cast("int")
          + ($"score" > element_at($"sc", 4)).cast("int")).as("stratum"))
      .groupBy($"stratum")
      .agg(count(lit(1)).as("n"),
        sum(when($"treated", 1L).otherwise(0L)).as("n_treated"),
        sum(when(!$"treated", 1L).otherwise(0L)).as("n_control"),
        sum(when($"treated", $"y".cast("long")).otherwise(0L)).as("y1"),
        sum(when(!$"treated", $"y".cast("long")).otherwise(0L)).as("y0"))
      .crossJoin(broadcast(tot))
      .select($"stratum", $"n", $"n_treated", $"n_control",
        when($"n_treated" === 0, lit(null).cast("double"))
          .otherwise(round($"y1".cast("double") / $"n_treated", 6))
          .as("y1_rate"),
        when($"n_control" === 0, lit(null).cast("double"))
          .otherwise(round($"y0".cast("double") / $"n_control", 6))
          .as("y0_rate"),
        when($"n_treated" === 0 || $"n_control" === 0,
          lit(null).cast("double"))
          .otherwise(round($"y1".cast("double") / $"n_treated"
            - $"y0".cast("double") / $"n_control", 6)).as("diff"),
        round($"n".cast("double") / $"n_all", 6).as("weight"))
      .orderBy($"stratum")
  }

  /** First-order Markov transition model of the per-user event-type
    * sequence, with each source state's conditional entropy — the
    * sequence-predictability statistic (how much does knowing the
    * current action tell you about the next) that complements
    * q_journeys' literal path mining. One lead() window per user builds
    * the bigram stream; everything after re-aggregates the
    * #types²-thin transition relation. Probabilities round once;
    * entropy terms round to DECIMAL(18,9) before the per-state sum. */
  def qMarkovChain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.df(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type".as("cur"))
      .withColumn("nxt", lead($"cur", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"cur", $"nxt").agg(count(lit(1)).as("n"))
      .localCheckpoint() // types²-thin; feeds totals + entropy + output
    val totals = trans.groupBy($"cur").agg(sum($"n").as("n_cur"))
    val withP = trans.join(broadcast(totals), "cur")
      .withColumn("p", round($"n".cast("double") / $"n_cur", 6))
    val ent = withP
      .select($"cur",
        round(-($"n" / $"n_cur" * log($"n" / $"n_cur")), 9)
          .cast(dec9).as("term"))
      .groupBy($"cur").agg(round(sum($"term").cast("double"), 6).as("h"))
    withP.join(broadcast(ent), "cur")
      .select($"cur", $"nxt", $"n", $"p", $"h".as("h_cur"))
      .orderBy($"cur", $"nxt")
  }

  /** Lag-1..7 autocorrelation of the daily purchase-value series — the
    * weekly-pattern detector a forecasting pipeline checks before
    * choosing seasonality terms. The stream reduces to the day-level
    * relation first (bounded by the calendar span, the q_survival
    * argument), the ACF numerator/denominator build from deviation
    * products rounded to DECIMAL(18,9), and each lag is one
    * day-arithmetic self-join on that tiny relation. */
  def qAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val daily = Tables.df(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum($"value".cast(DecimalType(18, 2))).as("x"))
      .localCheckpoint() // day-thin; feeds moments + all 7 lag joins
    val mom = daily.agg(count(lit(1)).as("nd"),
      sum($"x").as("sx"))
    val dev = daily.crossJoin(broadcast(mom))
      .select($"d",
        ($"x".cast("double") - $"sx".cast("double") / $"nd").as("e"))
      .localCheckpoint()
    val denom = dev
      .select(round($"e" * $"e", 9).cast(dec9).as("t"))
      .agg(sum($"t").as("den"))
    val lags = dev.select($"d", $"e")
      .join(dev.select($"d".as("d2"), $"e".as("e2")),
        datediff($"d", $"d2").between(1, 7))
      .select(datediff($"d", $"d2").as("lag"),
        round($"e" * $"e2", 9).cast(dec9).as("t"))
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"), sum($"t").as("num"))
    lags.crossJoin(broadcast(denom))
      .select($"lag", $"n_pairs",
        round($"num".cast("double") / $"den".cast("double"), 6)
          .as("acf"))
      .orderBy($"lag")
  }

  /** Sample-ratio-mismatch check — the A/B-test sanity gate that runs
    * BEFORE q_abtest is believed: the user-parity assignment should
    * split 50/50; z = (n_a − n_b)/√n flags |z| ≥ 3 (an SRM means the
    * assignment or logging is broken and every downstream metric is
    * suspect). One distinct-user aggregate, pure arithmetic after. */
  def qSrm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "events")
      .select($"user_id").distinct()
      .agg(sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"user_id" % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .select($"n_a", $"n_b",
        round($"n_a".cast("double") / ($"n_a" + $"n_b"), 6).as("ratio"),
        round(($"n_a" - $"n_b").cast("double")
          / sqrt(($"n_a" + $"n_b").cast("double")), 6).as("z"))
      .withColumn("srm_flag", abs($"z") >= 3.0)
  }

  /** Minimum detectable effect for the parity A/B test at the observed
    * sample size — the "is this experiment even worth running" power
    * calculation (80% power, two-sided 5%): MDE = (z_{α/2} + z_β) ·
    * √(2p(1−p)/n̄) with the exact normal quantiles as shared literals.
    * Unit of analysis = user-day (the q_abtest convention). */
  def qMde(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("d"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(($"user_id" % 2 === 0).as("arm_a"), $"conv")
    ud.agg(
        sum(when($"arm_a", 1L).otherwise(0L)).as("n_a"),
        sum(when(!$"arm_a", 1L).otherwise(0L)).as("n_b"),
        sum($"conv").as("n_conv"))
      .select($"n_a", $"n_b",
        round($"n_conv".cast("double") / ($"n_a" + $"n_b"), 6)
          .as("p_pool"),
        round((lit(1.959964) + lit(0.841621))
          * sqrt(lit(2.0) * ($"n_conv".cast("double") / ($"n_a" + $"n_b"))
            * (lit(1.0) - $"n_conv".cast("double") / ($"n_a" + $"n_b"))
            / (($"n_a" + $"n_b").cast("double") / 2)), 6).as("mde_abs"))
      .withColumn("mde_rel",
        round($"mde_abs" / $"p_pool", 6))
  }

  /** Rolling-origin backtest folds — time-series cross-validation's
    * split generator (the k-fold analog when leakage runs along time):
    * three cutoffs at 3/8, 4/8, 5/8 of the observed epoch range (exact
    * integer arithmetic), each with train = strictly before the cutoff
    * and test = the following range/8 window; per fold the sizes and
    * purchase rates a forecaster compares. One broadcast of the 1-row
    * range relation; each fold is a conditional aggregate in a single
    * events pass. */
  def qBacktestFolds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rng = Tables.df(spark, sfDir, "events")
      .agg(min(unix_micros($"ts".cast("timestamp"))).as("lo"),
        max(unix_micros($"ts".cast("timestamp"))).as("hi"))
    val ev = Tables.df(spark, sfDir, "events")
      .select(unix_micros($"ts".cast("timestamp")).as("us"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("pur"))
      .crossJoin(broadcast(rng))
      .select($"us", $"pur", $"lo", $"hi",
        explode(expr("sequence(3, 5)")).as("k"))
      .select($"k",
        expr("lo + (hi - lo) * k div 8").as("cut"),
        expr("(hi - lo) div 8").as("h"), $"us", $"pur")
    ev.groupBy(($"k" - 2).as("fold"))
      .agg(
        sum(when($"us" < $"cut", 1L).otherwise(0L)).as("n_train"),
        sum(when($"us" >= $"cut" && $"us" < $"cut" + $"h", 1L)
          .otherwise(0L)).as("n_test"),
        sum(when($"us" < $"cut", $"pur").otherwise(0L)).as("p_train"),
        sum(when($"us" >= $"cut" && $"us" < $"cut" + $"h", $"pur")
          .otherwise(0L)).as("p_test"))
      .select($"fold", $"n_train", $"n_test",
        round($"p_train".cast("double") / $"n_train", 6)
          .as("train_purchase_rate"),
        when($"n_test" === 0, lit(null).cast("double"))
          .otherwise(round($"p_test".cast("double") / $"n_test", 6))
          .as("test_purchase_rate"))
      .orderBy($"fold")
  }

  /** The windowed-drift model shared by q_drift_window and its
    * streaming twin: decile cuts + smoothed reference shares fit on the
    * FIRST time-half (frozen — a drift monitor never refits on the data
    * it monitors). Both relations are 1-row broadcasts. */
  private[graft] def driftRef(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val ev = Tables.df(spark, sfDir, "events")
    val mid = ev.agg(expr("(min(unix_micros(cast(ts as timestamp)))"
      + " + max(unix_micros(cast(ts as timestamp)))) div 2")
      .cast("long").as("mid_us"))
    val ref = ev.crossJoin(broadcast(mid))
      .filter(unix_micros($"ts".cast("timestamp")) < $"mid_us")
      .select($"value".as("v"))
    val cuts = ref.agg(expr(
      "transform(percentile(v, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6," +
        " 0.7, 0.8, 0.9)), x -> round(x, 6))").as("c"))
    val refShares = ref.crossJoin(broadcast(cuts))
      .select(driftBin($"v", $"c").as("bin"))
      .agg((1 to 10).map(i =>
          sum(when($"bin" === i, 1L).otherwise(0L)).as(s"r$i")).head,
        (1 to 10).map(i =>
          sum(when($"bin" === i, 1L).otherwise(0L)).as(s"r$i")).tail
          :+ count(lit(1)).as("n_ref"): _*)
    (cuts, refShares)
  }

  /** Decile-bin assignment against the broadcast cut array. */
  private[graft] def driftBin(v: Column, c: Column): Column =
    (1 to 9).map(i => (v > element_at(c, i)).cast("int"))
      .foldLeft(lit(1))(_ + _)

  /** The per-window conditional bin sums (c1..c10, n) — the ONE
    * stateful aggregation both the batch query and the streaming twin
    * run; everything after is a stateless projection. */
  private[graft] def driftBinSums(spark: SparkSession)
      : Seq[Column] = {
    import spark.implicits._
    (1 to 10).map(i =>
      sum(when($"bin" === i, 1L).otherwise(0L)).as(s"c$i")) :+
      count(lit(1)).as("n")
  }

  /** Smoothed PSI over the ten bin-count columns vs the broadcast
    * reference shares: Σ (p−r)·ln(p/r) with (count+0.5)/(n+5)
    * smoothing (no zero-bin blowup), terms rounded to DECIMAL(18,9)
    * before the exact sum. */
  private[graft] def driftPsi(spark: SparkSession): Column = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    (1 to 10).map { i =>
      val p = (col(s"c$i") + 0.5) / ($"n" + 5)
      val r = (col(s"r$i") + 0.5) / ($"n_ref" + 5)
      round((p - r) * log(p / r), 9).cast(dec9)
    }.reduce(_ + _).cast("double")
  }

  /** Windowed drift monitor: smoothed PSI of the event-value
    * distribution per 3-day tumbling window against the frozen
    * first-half reference deciles — q_drift_psi's one-number drift
    * turned into a TREND a data-quality dashboard alarms on. Epoch
    * floor-div windowing (≡ Spark's epoch-aligned `window()`, proven by
    * the streaming twin spec); one stateful aggregation per window,
    * PSI as a stateless projection — exactly the plan the streaming
    * twin runs per micro-batch. */
  def qDriftWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (cuts, refShares) = driftRef(spark, sfDir)
    val binned = Tables.df(spark, sfDir, "events")
      .crossJoin(broadcast(cuts))
      .select( // integer div: exact at any epoch magnitude
        expr("unix_micros(cast(ts as timestamp)) div 259200000000")
          .cast("long").as("wk"),
        driftBin($"value", $"c").as("bin"))
    val sums = driftBinSums(spark)
    binned.groupBy($"wk").agg(sums.head, sums.tail: _*)
      .crossJoin(broadcast(refShares))
      .select($"wk", ($"wk" * lit(259200L)).as("w_start_s"), $"n",
        round(driftPsi(spark), 6).as("psi"))
      .withColumn("drift", $"psi" > 0.2)
      .orderBy($"wk")
  }

  /** Always-valid sequential A/B monitoring (the mSPRT normal-mixture
    * boundary, Robbins '70 / Johari et al. KDD'17 shape): per calendar
    * day, the CUMULATIVE two-proportion z of the parity experiment
    * against the always-valid boundary z² ≥ ((n+τ)/n)·ln((n+τ)/(τα²))
    * with τ = 100, α = 0.05 — the test a dashboard may peek at daily
    * without inflating false positives (q_abtest's fixed-horizon z is
    * only valid once). Unit = user-day (the q_abtest convention); the
    * cumulative windows run on the bounded day-level relation; the
    * parity null must never cross (pinned in the spec). */
  def qMsprt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("d"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .groupBy($"d")
      .agg(sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("na_d"),
        sum(when($"user_id" % 2 === 1, 1L).otherwise(0L)).as("nb_d"),
        sum(when($"user_id" % 2 === 0, $"conv").otherwise(0L)).as("xa_d"),
        sum(when($"user_id" % 2 === 1, $"conv").otherwise(0L)).as("xb_d"))
    val wCum = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("na", sum($"na_d").over(wCum))
      .withColumn("nb", sum($"nb_d").over(wCum))
      .withColumn("xa", sum($"xa_d").over(wCum))
      .withColumn("xb", sum($"xb_d").over(wCum))
      .withColumn("p",
        ($"xa" + $"xb").cast("double") / ($"na" + $"nb"))
      .withColumn("se", sqrt($"p" * (lit(1.0) - $"p")
        * (lit(1.0) / $"na" + lit(1.0) / $"nb")))
      .withColumn("z", when($"se" === 0, lit(null).cast("double"))
        .otherwise(round(($"xa".cast("double") / $"na"
          - $"xb".cast("double") / $"nb") / $"se", 6)))
      .withColumn("bound", round(sqrt(
        (($"na" + $"nb" + 100).cast("double") / ($"na" + $"nb"))
          * log((($"na" + $"nb" + 100).cast("double") / 100)
            / 0.0025)), 6))
      .select($"d".cast("string").as("d"), $"na", $"nb", $"xa", $"xb",
        $"z", $"bound",
        (abs(coalesce($"z", lit(0.0))) >= $"bound").as("crossed"))
      .orderBy($"d")
  }

  /** CUSUM changepoint scan over the daily event-count series: the
    * classic single-changepoint estimator argmax_t |S_t − (t/n)·S_n|
    * (the cumulative sum's maximum deviation from the no-change line),
    * reported with the level before and after the estimated break —
    * the "did the pipeline's input volume shift, and when" read. The
    * scan statistic is windows over the bounded day relation; means
    * re-aggregate the same relation against the broadcast 1-row
    * argmax. Ties break to the earliest day. */
  def qChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.df(spark, sfDir, "events")
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint() // day-thin; feeds the scan + both means
    val wCum = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).as("n"), sum($"x").as("sn"))
    val scan = daily.crossJoin(broadcast(tot))
      .withColumn("t", row_number().over(Window.orderBy($"d")))
      .withColumn("st", sum($"x").over(wCum))
      .withColumn("g", round(abs($"st".cast("double")
        - $"t".cast("double") * $"sn" / $"n"), 9))
    val cp = scan.orderBy($"g".desc, $"d".asc).limit(1)
      .select($"d".as("cp_d"), $"t".as("cp_t"), $"g".as("g_max"),
        $"n", $"sn")
    daily.crossJoin(broadcast(cp))
      .groupBy($"cp_d", $"cp_t", $"g_max", $"n")
      .agg(sum(when($"d" <= $"cp_d", $"x").otherwise(0L)).as("sb"),
        sum(when($"d" > $"cp_d", $"x").otherwise(0L)).as("sa"))
      .select($"cp_d".cast("string").as("cp_day"), $"n".as("n_days"),
        round($"g_max", 6).as("g_max"),
        round($"sb".cast("double") / $"cp_t", 6).as("mean_before"),
        when($"n" === $"cp_t", lit(null).cast("double"))
          .otherwise(round($"sa".cast("double") / ($"n" - $"cp_t"), 6))
          .as("mean_after"))
  }

  /** CUPED variance reduction (Deng et al. WSDM'13) for the parity
    * experiment: each user's pre-period activity (event count in the
    * first time-half) is the covariate; θ = cov(pre, post)/var(pre)
    * fits on the pooled sample; the adjusted outcome y − θ·(pre − p̄)
    * keeps the treatment contrast unbiased while shrinking its
    * variance by the covariate's R². Reports raw vs adjusted arm
    * difference and the realized variance reduction — the technique
    * that makes the q_mde budget smaller for free. All moments are
    * exact integer sums (pre and post are counts); the only rounding
    * is the per-user adjusted outcome's DECIMAL(18,9) pre-sum. */
  def qCuped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(18, 9)
    val ev = Tables.df(spark, sfDir, "events")
    val mid = ev.agg(expr("(min(unix_micros(cast(ts as timestamp)))"
      + " + max(unix_micros(cast(ts as timestamp)))) div 2")
      .cast("long").as("mid_us"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(sum(when(unix_micros($"ts".cast("timestamp")) < $"mid_us",
          1L).otherwise(0L)).as("pre"),
        // outcome = second-half purchase COUNT, not an indicator: the
        // indicator saturates on small fixtures (every user converts,
        // var = 0) and counts are the natural CUPED metric anyway
        sum(when(unix_micros($"ts".cast("timestamp")) >= $"mid_us"
          && $"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("arm_a", $"user_id" % 2 === 0)
      .localCheckpoint() // user-thin; feeds theta + both arm passes
    val mom = users.agg(count(lit(1)).as("n"),
      sum($"pre").as("sp"), sum($"y").as("sy"),
      sum($"pre" * $"y").as("spy"), sum($"pre" * $"pre").as("spp"))
    // ADVICE r10 #5: if every user shares the same pre-period count,
    // var(pre) = 0 and theta = cov/var is Inf/NaN, silently poisoning
    // diff_adj — NULL-guard the division (mirroring var_reduction's
    // guard below and the oracle's CASE), so the degenerate-covariate
    // case reports NULL adjusted columns instead of garbage
    val theta = mom.select($"n", $"sp", $"sy",
      when($"spp".cast("double") - $"sp".cast("double") * $"sp" / $"n"
          === 0, lit(null).cast("double"))
        .otherwise(round(
          ($"spy".cast("double") - $"sp".cast("double") * $"sy" / $"n")
          / ($"spp".cast("double") - $"sp".cast("double") * $"sp" / $"n"),
          9)).as("theta"),
      round($"sp".cast("double") / $"n", 9).as("pbar"))
    val adj = users.crossJoin(broadcast(theta))
      .withColumn("ya_d",
        round($"y" - $"theta" * ($"pre" - $"pbar"), 9))
      .select($"arm_a", $"y", $"n", $"theta",
        $"ya_d".cast(dec9).as("ya"),
        // square in DOUBLE then round once: a decimal-decimal square
        // would tie-round differently across engines
        round($"ya_d" * $"ya_d", 9).cast(dec9).as("ya2"))
    adj.groupBy($"n", $"theta")
      .agg(
        sum(when($"arm_a", 1L).otherwise(0L)).as("na"),
        sum(when(!$"arm_a", 1L).otherwise(0L)).as("nb"),
        sum(when($"arm_a", $"y").otherwise(0L)).as("ya_raw"),
        sum(when(!$"arm_a", $"y").otherwise(0L)).as("yb_raw"),
        sum(when($"arm_a", $"ya").otherwise(lit(0).cast(dec9)))
          .as("ya_adj"),
        sum(when(!$"arm_a", $"ya").otherwise(lit(0).cast(dec9)))
          .as("yb_adj"),
        sum($"y" * $"y").as("syy"),
        sum($"ya2").as("syy_adj"),
        sum($"y").as("sy"), sum($"ya").as("sya"))
      .select($"n".as("n_users"), round($"theta", 6).as("theta"),
        round($"ya_raw".cast("double") / $"na"
          - $"yb_raw".cast("double") / $"nb", 6).as("diff_raw"),
        round($"ya_adj".cast("double") / $"na"
          - $"yb_adj".cast("double") / $"nb", 6).as("diff_adj"),
        when($"syy".cast("double")
            - $"sy".cast("double") * $"sy" / $"n" === 0,
          lit(null).cast("double"))
          .otherwise(round(lit(1.0)
            - ($"syy_adj".cast("double")
              - $"sya".cast("double") * $"sya" / $"n")
            / ($"syy".cast("double")
              - $"sy".cast("double") * $"sy" / $"n"), 6))
          .as("var_reduction"))
  }

  /** Quantile treatment effects for the parity experiment: the per-arm
    * exact deciles of purchase value and their differences — where in
    * the outcome DISTRIBUTION the arms differ, which a mean contrast
    * (q_abtest) cannot see. Exact percentile arrays per arm
    * (≡ quantile_cont), one row per decile. */
  def qQte(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v = Tables.df(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select(($"user_id" % 2 === 0).as("arm_a"), $"value".as("v"))
    val qs = v.groupBy($"arm_a")
      .agg(expr("transform(percentile(v, array(0.1, 0.2, 0.3, 0.4," +
        " 0.5, 0.6, 0.7, 0.8, 0.9)), x -> round(x, 6))").as("q"),
        count(lit(1)).as("n"))
    val a = qs.filter($"arm_a").select($"q".as("qa"), $"n".as("n_a"))
    val b = qs.filter(!$"arm_a").select($"q".as("qb"), $"n".as("n_b"))
    a.crossJoin(broadcast(b))
      .select(explode(expr("sequence(1, 9)")).as("decile"),
        $"qa", $"qb", $"n_a", $"n_b")
      .select($"decile", ($"decile" * 10).as("pct"), $"n_a", $"n_b",
        element_at($"qa", $"decile").as("v_a"),
        element_at($"qb", $"decile").as("v_b"),
        round(element_at($"qa", $"decile")
          - element_at($"qb", $"decile"), 6).as("qte"))
      .orderBy($"decile")
  }

  // ---- q_obrien_fleming ------------------------------------------------------
  /** Group-sequential monitoring with O'Brien–Fleming-shaped boundaries
    * (O'Brien & Fleming '79) — the FIXED-SCHEDULE complement to
    * [[qMsprt]]'s always-valid test: the parity A/B's user-day
    * conversion z ([[qAbtest]]'s exact-integer unit relation) evaluated
    * at five equally-spaced looks (days 6/12/18/24/30), each compared
    * to the spending boundary C·√(K/k) with C = 2.04 (the two-sided 5%
    * OBF constant for K = 5) — early looks demand ~4.6σ, the final look
    * ~2.04σ, which is how the schedule spends almost no α early.
    * Cumulative counts are exact integers from one window over the
    * 30-row day relation; z and the boundary are shared double closed
    * forms. Null pinned: the parity arms never cross. */
  def qObrienFleming(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.df(spark, sfDir, "events")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(($"user_id" % 2 === 0).as("a"), $"day", $"conv")
      .groupBy($"day").agg(
        sum(when($"a", 1L).otherwise(0L)).as("n_a"),
        sum(when($"a", $"conv").otherwise(0L)).as("c_a"),
        sum(when(!$"a", 1L).otherwise(0L)).as("n_b"),
        sum(when(!$"a", $"conv").otherwise(0L)).as("c_b"))
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("na", sum($"n_a").over(w))
      .withColumn("ca", sum($"c_a").over(w))
      .withColumn("nb", sum($"n_b").over(w))
      .withColumn("cb", sum($"c_b").over(w))
      .withColumn("di",
        datediff($"day", lit("2024-01-01").cast("date")) + lit(1))
      .filter($"di" % 6 === 0)
      .withColumn("look", $"di" / lit(6))
    val pa = $"ca".cast("double") / $"na"
    val pb = $"cb".cast("double") / $"nb"
    val pp = ($"ca" + $"cb").cast("double") / ($"na" + $"nb")
    val se2 = pp * (lit(1.0) - pp) *
      (lit(1.0) / $"na" + lit(1.0) / $"nb")
    val z = when(se2 > 0.0, (pa - pb) / sqrt(se2))
    val bound = lit(2.04) * sqrt(lit(5.0) / $"look".cast("double"))
    cum.select($"look".cast("long").as("look"), $"day",
        ($"na" + $"nb").as("n_cum"), round(z, 6).as("z"),
        round(bound, 6).as("boundary"),
        (abs(z) > bound).as("crossed"))
      .orderBy($"look")
  }

  // ---- q_streaks -------------------------------------------------------------
  /** Gaps-and-islands: each user's CONSECUTIVE-active-day streaks — the
    * classic warehouse idiom (island key = day_index − row_number, so
    * consecutive days share a key) a retention team runs beside
    * [[qStickiness]]'s ratio metrics. Per user: the longest streak (tie
    * → earliest start), island count, and total active days; top-20
    * users by longest streak. All integer/date arithmetic — exact on
    * both engines. Scale shape: the (user, day) relation is the
    * user-day grain (bounded by users × span); every window partitions
    * by user; the final top-20 is TakeOrderedAndProject. */
  def qStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val act = Tables.df(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"d")
    val isl = act
      .withColumn("g",
        datediff($"d", lit("2024-01-01").cast("date")) -
          row_number().over(w))
      .groupBy($"user_id", $"g")
      .agg(count(lit(1)).as("len"), min($"d").as("start"))
    val pick = Window.partitionBy($"user_id")
      .orderBy($"len".desc, $"start".asc)
    isl
      .withColumn("rk", row_number().over(pick))
      .groupBy($"user_id")
      .agg(max(when($"rk" === 1, $"len")).as("longest_streak"),
        max(when($"rk" === 1, $"start")).as("streak_start"),
        count(lit(1)).as("n_islands"), sum($"len").as("n_active_days"))
      .orderBy($"longest_streak".desc, $"user_id".asc)
      .limit(20)
  }

  // ---- q_cohort_retention ------------------------------------------------
  /** The weekly cohort-retention triangle — the canonical product-health
    * read (users grouped by first-activity week; for each later week,
    * the fraction still active) that sits under every retention curve
    * and LTV model; q_survival gives the event-level K-M curve, this
    * gives the calendar-cohort grid a growth team actually reads. Week
    * buckets are INTEGER arithmetic on days since the fixture epoch
    * (⌊datediff/7⌋ — engine-exact; date_trunc('week') differs subtly
    * across engines' week-start conventions so it is deliberately
    * avoided). Shapes for scale: one shuffle by user for the first-week
    * min, one distinct on the (user, week) activity grain, then the
    * cohort×offset grid is ≤ weeks² rows with cohort sizes broadcast
    * back — the corpus is touched exactly twice, both times collapsing
    * to user-grain. */
  def qCohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.df(spark, sfDir, "events")
      .select($"user_id",
        floor(datediff(to_date($"ts"), lit("2024-01-01")) / lit(7.0))
          .cast("int").as("wk"))
    val act = ev.distinct().localCheckpoint() // user×week-thin; 2 readers
    val first = act.groupBy($"user_id").agg(min($"wk").as("cwk"))
    val sizes = first.groupBy($"cwk").agg(count(lit(1)).as("cohort_size"))
    act.join(first, "user_id")
      .groupBy($"cwk", ($"wk" - $"cwk").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cwk")
      .select($"cwk".as("cohort_week"), $"week_offset", $"cohort_size",
        $"n_active",
        round($"n_active".cast("double") / $"cohort_size", 6)
          .as("retention"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohort_retention" -> qCohortRetention,
    "q_streaks" -> qStreaks,
    "q_obrien_fleming" -> qObrienFleming,
    "q_cuped" -> qCuped,
    "q_qte" -> qQte,
    "q_changepoint" -> qChangepoint,
    "q_msprt" -> qMsprt,
    "q_drift_window" -> qDriftWindow,
    "q_srm" -> qSrm,
    "q_mde" -> qMde,
    "q_backtest_folds" -> qBacktestFolds,
    "q_markov_chain" -> qMarkovChain,
    "q_autocorr" -> qAutocorr,
    "q_propensity" -> qPropensity,
    "q_attribution_u" -> qAttributionU,
    "q_seasonality" -> qSeasonality,
    "q_returns" -> qReturns,
    "q_survival" -> qSurvival,
    "q_cox_score" -> qCoxScore,
    "q_km_ci" -> qKmCi,
    "q_ltv" -> qLtv,
    "q_offline_eval" -> qOfflineEval,
    "q_abtest" -> qAbtest,
    "q_seq_mining" -> qSeqMining,
    "q_interarrival" -> qInterarrival,
    "q_logrank" -> qLogrank,
    "q_did" -> qDid,
    "q_funnel_sessions" -> qFunnelSessions,
    "q_journeys" -> qJourneys,
    "q_split_temporal" -> qSplitTemporal,
    "q_funnel_staged" -> qFunnelStaged,
    "q_scd2" -> qScd2,
    "q_pit_join" -> qPitJoin,
    "q_seq_examples" -> qSeqExamples,
    "q_anomaly_running" -> qAnomalyRunning,
    "q_tumbling" -> qTumbling,
    "q_sliding" -> qSliding,
    "q_session" -> qSession,
    "q_dedup_events" -> qDedupEvents,
    "q_resample" -> qResample,
    "q_attribution" -> qAttribution
  )

  private val bucket5m =
    "make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)"

  /** Generated q_drift_window oracle — same frozen first-half reference,
    * same smoothed PSI terms, bins unrolled to match the Spark plan's
    * ten conditional sums. */
  private def driftWindowOracle: String = {
    val binCase = "1 + " + (1 to 9)
      .map(i => s"CAST(v > c[$i] AS INT)").mkString(" + ")
    val refSums = (1 to 10).map(i =>
      s"CAST(sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS r$i").mkString(",\n|    ")
    val winSums = (1 to 10).map(i =>
      s"CAST(sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS c$i").mkString(",\n|    ")
    val terms = (1 to 10).map(i =>
      s"""CAST(round(((c$i + 0.5) / (n + 5) - (r$i + 0.5) / (n_ref + 5))
         |      * ln(((c$i + 0.5) / (n + 5))
         |        / ((r$i + 0.5) / (n_ref + 5))), 9) AS DECIMAL(18,9))"""
        .stripMargin).mkString("\n|    + ")
    s"""WITH mid AS (
      |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
      |  FROM events),
      |ref AS (
      |  SELECT value AS v FROM events CROSS JOIN mid
      |  WHERE epoch_us(ts) < mid.mid_us),
      |cuts AS (
      |  SELECT list_transform(quantile_cont(v,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
      |    x -> round(x, 6)) AS c
      |  FROM ref),
      |refbin AS (
      |  SELECT $binCase AS bin FROM ref CROSS JOIN cuts),
      |refsh AS (
      |  SELECT $refSums,
      |    count(*) AS n_ref
      |  FROM refbin),
      |wb AS (
      |  SELECT epoch_us(ts) // 259200000000 AS wk,
      |    $binCase AS bin
      |  FROM (SELECT ts, value AS v FROM events) CROSS JOIN cuts),
      |ws AS (
      |  SELECT wk,
      |    $winSums,
      |    count(*) AS n
      |  FROM wb GROUP BY wk),
      |p AS (
      |  SELECT wk, wk * 259200 AS w_start_s, n, refsh.n_ref,
      |    round(CAST($terms
      |      AS DOUBLE), 6) AS psi
      |  FROM ws CROSS JOIN refsh)
      |SELECT wk, w_start_s, n, psi, psi > 0.2 AS drift
      |FROM p ORDER BY wk""".stripMargin
  }

  /** The q_survival oracle CTE chain through relation `s`
    * (t, n_risk, d, c_censored, term, absorbed) — the shared prefix
    * BOTH `curve` (q_survival / q_ltv, via [[survivalCtes]]) and
    * q_km_ci's `gw0` CTE build on, so neither consumer can drift from
    * the estimator. (q_km_ci was previously spliced out of the
    * finished curve SQL by string replace of a 7-line literal; any
    * whitespace edit to the curve CTE would have silently no-opped the
    * splice into malformed SQL.) */
  private val survivalPrefixCtes: String =
    """WITH horizon AS (SELECT max(ts) AS max_ts FROM events),
        |users AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS INT) AS t,
        |    max(ts) < (SELECT max_ts FROM horizon) - INTERVAL 7 DAY
        |      AS churned
        |  FROM events GROUP BY user_id),
        |byt AS (
        |  SELECT t, count(*) AS m_all,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM users GROUP BY t),
        |n AS (SELECT count(*) AS n_users FROM users),
        |r AS (
        |  SELECT t, m_all, d,
        |    n.n_users - CAST(COALESCE(sum(m_all) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM byt CROSS JOIN n),
        |s AS (
        |  SELECT t, n_risk, d, m_all - d AS c_censored,
        |    CASE WHEN d < n_risk THEN
        |      CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
        |        AS DECIMAL(18,9)) ELSE NULL END AS term,
        |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS absorbed
        |  FROM r)""".stripMargin

  /** survivalPrefixCtes + the `curve` CTE (t, n_risk, d_churned,
    * c_censored, survival) — the relation q_survival and q_ltv
    * consume. */
  private val survivalCtes: String = survivalPrefixCtes + ",\n" +
    """curve AS (
      |  SELECT t, n_risk, d AS d_churned, c_censored,
      |  CASE WHEN absorbed = 1 THEN 0.0
      |  ELSE round(exp(CAST(sum(COALESCE(term,
      |    CAST(0 AS DECIMAL(18,9)))) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE)), 6) END AS survival
      |  FROM s)""".stripMargin

  val oracle: Map[String, String] = Map(
    // same lifetime/churn construction as q_survival, suffix-sum risk
    // sets, 9dp once-rounded U/I terms into decimal sums, one shared
    // double chain for beta/HR/chi2
    "q_cox_score" ->
      """WITH users0 AS (
        |  SELECT
        |    min(ts) AS first_ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS purch_ts,
        |    CAST(user_id % 2 AS BIGINT) AS x
        |  FROM events GROUP BY user_id),
        |users AS (
        |  SELECT CAST(date_diff('day', CAST(first_ts AS DATE),
        |      CAST(purch_ts AS DATE)) AS INT) AS t, x
        |  FROM users0 WHERE purch_ts IS NOT NULL),
        |byt AS (
        |  SELECT t, count(*) AS m_all, CAST(sum(x) AS BIGINT) AS mx_all,
        |    count(*) AS d, CAST(sum(x) AS BIGINT) AS dx
        |  FROM users GROUP BY t),
        |suf AS (
        |  SELECT t, d, dx,
        |    CAST(sum(m_all) OVER wsuf AS BIGINT) AS s0,
        |    CAST(sum(mx_all) OVER wsuf AS BIGINT) AS s1
        |  FROM byt
        |  WINDOW wsuf AS (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |terms AS (
        |  SELECT
        |    CAST(round(dx - d * (CAST(s1 AS DOUBLE) / s0), 9)
        |      AS DECIMAL(18,9)) AS u_t,
        |    CAST(round(d * (CAST(s1 AS DOUBLE) / s0)
        |      * (1.0 - CAST(s1 AS DOUBLE) / s0), 9)
        |      AS DECIMAL(18,9)) AS i_t
        |  FROM suf WHERE d > 0),
        |ui AS (SELECT sum(u_t) AS u, sum(i_t) AS i FROM terms),
        |n AS (
        |  SELECT count(*) AS n_users, count(*) AS n_events FROM users)
        |SELECT n_users, n_events,
        |  round(CAST(u AS DOUBLE), 6) AS score_u,
        |  round(CAST(i AS DOUBLE), 6) AS info_i,
        |  CASE WHEN i > 0
        |    THEN round(CAST(u AS DOUBLE) / CAST(i AS DOUBLE), 6) END
        |    AS beta,
        |  CASE WHEN i > 0
        |    THEN round(exp(CAST(u AS DOUBLE) / CAST(i AS DOUBLE)), 6) END
        |    AS hazard_ratio,
        |  CASE WHEN i > 0
        |    THEN round(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)
        |      / CAST(i AS DOUBLE), 6) END AS score_chi2,
        |  CASE WHEN i > 0
        |    THEN round(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)
        |      / CAST(i AS DOUBLE), 6) > 3.841 END AS sig_05
        |FROM ui CROSS JOIN n""".stripMargin,

    "q_drift_window" -> driftWindowOracle,

    // the same survival chain + 12dp Greenwood terms and the clamped
    // linear band off the already-rounded survival column
    "q_km_ci" ->
      (survivalPrefixCtes + """,
        |gw0 AS (
        |  SELECT t, n_risk, d,
        |    CASE WHEN absorbed = 1 THEN 0.0
        |    ELSE round(exp(CAST(sum(COALESCE(term,
        |      CAST(0 AS DECIMAL(18,9)))) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE)), 6) END AS survival,
        |    sum(COALESCE(CASE WHEN d < n_risk THEN
        |        CAST(round(CAST(d AS DOUBLE)
        |          / (CAST(n_risk AS DOUBLE) * (n_risk - d)), 12)
        |          AS DECIMAL(18,12)) END,
        |      CAST(0 AS DECIMAL(18,12)))) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gw
        |  FROM s)
        |SELECT t, n_risk, d AS d_churned, survival,
        |  round(survival * sqrt(CAST(gw AS DOUBLE)), 6) AS se,
        |  round(greatest(survival
        |    - 1.959964 * (survival * sqrt(CAST(gw AS DOUBLE))), 0.0), 6)
        |    AS ci_lo,
        |  round(least(survival
        |    + 1.959964 * (survival * sqrt(CAST(gw AS DOUBLE))), 1.0), 6)
        |    AS ci_hi
        |FROM gw0 ORDER BY t""".stripMargin),

    // same integer-exact moments, same 9dp theta/pbar and DECIMAL(18,9)
    // adjusted outcomes, same closed-form variance-reduction ratio
    "q_cuped" ->
      """WITH mid AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
        |  FROM events),
        |users AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid_us FROM mid)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS pre,
        |    CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid_us
        |      FROM mid) AND event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    user_id % 2 = 0 AS arm_a
        |  FROM events GROUP BY user_id),
        |mom AS (
        |  SELECT count(*) AS n, CAST(sum(pre) AS BIGINT) AS sp,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(pre * y) AS BIGINT) AS spy,
        |    CAST(sum(pre * pre) AS BIGINT) AS spp
        |  FROM users),
        |th AS (
        |  SELECT n, sp, sy,
        |    CASE WHEN CAST(spp AS DOUBLE)
        |        - CAST(sp AS DOUBLE) * sp / n = 0 THEN NULL
        |      ELSE round((CAST(spy AS DOUBLE)
        |        - CAST(sp AS DOUBLE) * sy / n)
        |      / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / n), 9)
        |      END AS theta,
        |    round(CAST(sp AS DOUBLE) / n, 9) AS pbar
        |  FROM mom),
        |adj0 AS (
        |  SELECT u.arm_a, u.y, th.n, th.theta,
        |    round(u.y - th.theta * (u.pre - th.pbar), 9) AS ya_d
        |  FROM users u CROSS JOIN th),
        |adj AS (
        |  SELECT arm_a, y, n, theta,
        |    CAST(ya_d AS DECIMAL(18,9)) AS ya,
        |    CAST(round(ya_d * ya_d, 9) AS DECIMAL(18,9)) AS ya2
        |  FROM adj0),
        |agg AS (
        |  SELECT n, theta,
        |    CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN arm_a THEN y ELSE 0 END) AS BIGINT)
        |      AS ya_raw,
        |    CAST(sum(CASE WHEN arm_a THEN 0 ELSE y END) AS BIGINT)
        |      AS yb_raw,
        |    sum(CASE WHEN arm_a THEN ya
        |      ELSE CAST(0 AS DECIMAL(18,9)) END) AS ya_adj,
        |    sum(CASE WHEN arm_a THEN CAST(0 AS DECIMAL(18,9))
        |      ELSE ya END) AS yb_adj,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    sum(ya2) AS syy_adj,
        |    CAST(sum(y) AS BIGINT) AS sy2, sum(ya) AS sya
        |  FROM adj GROUP BY 1, 2)
        |SELECT n AS n_users, round(theta, 6) AS theta,
        |  round(CAST(ya_raw AS DOUBLE) / na
        |    - CAST(yb_raw AS DOUBLE) / nb, 6) AS diff_raw,
        |  round(CAST(ya_adj AS DOUBLE) / na
        |    - CAST(yb_adj AS DOUBLE) / nb, 6) AS diff_adj,
        |  CASE WHEN CAST(syy AS DOUBLE)
        |      - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE) / n = 0
        |    THEN NULL
        |    ELSE round(1.0
        |      - (CAST(syy_adj AS DOUBLE)
        |        - CAST(sya AS DOUBLE) * CAST(sya AS DOUBLE) / n)
        |      / (CAST(syy AS DOUBLE)
        |        - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE) / n), 6)
        |    END AS var_reduction
        |FROM agg""".stripMargin,

    // same per-arm exact percentile ladders and per-decile differences
    "q_qte" ->
      """WITH v AS (
        |  SELECT user_id % 2 = 0 AS arm_a, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |qs AS (
        |  SELECT arm_a,
        |    list_transform(quantile_cont(v,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |      x -> round(x, 6)) AS q,
        |    count(*) AS n
        |  FROM v GROUP BY 1),
        |a AS (SELECT q AS qa, n AS n_a FROM qs WHERE arm_a),
        |b AS (SELECT q AS qb, n AS n_b FROM qs WHERE NOT arm_a),
        |g AS (
        |  SELECT unnest(range(1, 10)) AS decile, qa, qb, n_a, n_b
        |  FROM a CROSS JOIN b)
        |SELECT CAST(decile AS INT) AS decile,
        |  CAST(decile * 10 AS INT) AS pct, n_a, n_b,
        |  qa[decile] AS v_a, qb[decile] AS v_b,
        |  round(qa[decile] - qb[decile], 6) AS qte
        |FROM g ORDER BY decile""".stripMargin,

    // same day-level reduction, same 9dp scan statistic with earliest-
    // day tie-break, same guarded post-break mean
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, count(*) AS x
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sn
        |  FROM daily),
        |scan AS (
        |  SELECT d, x, tot.n, tot.sn,
        |    row_number() OVER (ORDER BY d) AS t,
        |    CAST(sum(x) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS st
        |  FROM daily CROSS JOIN tot),
        |g AS (
        |  SELECT d, t, n, sn,
        |    round(abs(CAST(st AS DOUBLE)
        |      - CAST(t AS DOUBLE) * sn / n), 9) AS g
        |  FROM scan),
        |cp AS (
        |  SELECT d AS cp_d, t AS cp_t, g AS g_max, n, sn
        |  FROM g ORDER BY g DESC, d ASC LIMIT 1),
        |m AS (
        |  SELECT cp.cp_d, cp.cp_t, cp.g_max, cp.n,
        |    CAST(sum(CASE WHEN daily.d <= cp.cp_d THEN daily.x
        |      ELSE 0 END) AS BIGINT) AS sb,
        |    CAST(sum(CASE WHEN daily.d > cp.cp_d THEN daily.x
        |      ELSE 0 END) AS BIGINT) AS sa
        |  FROM daily CROSS JOIN cp
        |  GROUP BY 1, 2, 3, 4)
        |SELECT CAST(cp_d AS VARCHAR) AS cp_day, n AS n_days,
        |  round(g_max, 6) AS g_max,
        |  round(CAST(sb AS DOUBLE) / cp_t, 6) AS mean_before,
        |  CASE WHEN n = cp_t THEN NULL
        |    ELSE round(CAST(sa AS DOUBLE) / (n - cp_t), 6) END
        |    AS mean_after
        |FROM m""".stripMargin,

    // same user-day unit, same cumulative day windows, same tau=100 /
    // alpha=0.05 always-valid boundary expression
    "q_msprt" ->
      """WITH ud AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT d,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na_d,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nb_d,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS xa_d,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS xb_d
        |  FROM ud GROUP BY 1),
        |cum AS (
        |  SELECT d,
        |    CAST(sum(na_d) OVER w AS BIGINT) AS na,
        |    CAST(sum(nb_d) OVER w AS BIGINT) AS nb,
        |    CAST(sum(xa_d) OVER w AS BIGINT) AS xa,
        |    CAST(sum(xb_d) OVER w AS BIGINT) AS xb
        |  FROM daily
        |  WINDOW w AS (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |zt AS (
        |  SELECT d, na, nb, xa, xb,
        |    CAST(xa + xb AS DOUBLE) / (na + nb) AS p,
        |    sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
        |      * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))
        |      * (1.0 / na + 1.0 / nb)) AS se
        |  FROM cum),
        |r AS (
        |  SELECT d, na, nb, xa, xb,
        |    CASE WHEN se = 0 THEN NULL
        |      ELSE round((CAST(xa AS DOUBLE) / na
        |        - CAST(xb AS DOUBLE) / nb) / se, 6) END AS z,
        |    round(sqrt((CAST(na + nb + 100 AS DOUBLE) / (na + nb))
        |      * ln((CAST(na + nb + 100 AS DOUBLE) / 100) / 0.0025)), 6)
        |      AS bound
        |  FROM zt)
        |SELECT CAST(d AS VARCHAR) AS d, na, nb, xa, xb, z, bound,
        |  abs(COALESCE(z, 0.0)) >= bound AS crossed
        |FROM r ORDER BY d""".stripMargin,

    // same distinct-user parity split, same z formula
    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u)
        |SELECT n_a, n_b,
        |  round(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS ratio,
        |  round(CAST(n_a - n_b AS DOUBLE)
        |    / sqrt(CAST(n_a + n_b AS DOUBLE)), 6) AS z,
        |  abs(round(CAST(n_a - n_b AS DOUBLE)
        |    / sqrt(CAST(n_a + n_b AS DOUBLE)), 6)) >= 3.0 AS srm_flag
        |FROM c""".stripMargin,

    // same user-day conversion unit, same exact normal-quantile
    // literals and expression order
    "q_mde" ->
      """WITH ud AS (
        |  SELECT user_id % 2 = 0 AS arm_a,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM ud)
        |SELECT n_a, n_b,
        |  round(CAST(n_conv AS DOUBLE) / (n_a + n_b), 6) AS p_pool,
        |  round((1.959964 + 0.841621)
        |    * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |      / (CAST(n_a + n_b AS DOUBLE) / 2)), 6) AS mde_abs,
        |  round(round((1.959964 + 0.841621)
        |    * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |      / (CAST(n_a + n_b AS DOUBLE) / 2)), 6)
        |    / round(CAST(n_conv AS DOUBLE) / (n_a + n_b), 6), 6)
        |    AS mde_rel
        |FROM c""".stripMargin,

    // same integer-div cutoffs on the epoch range, same strictly-before
    // train and range/8 test windows
    "q_backtest_folds" ->
      """WITH rng AS (
        |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |  FROM events),
        |ev AS (
        |  SELECT epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur,
        |    k, rng.lo + (rng.hi - rng.lo) * k // 8 AS cut,
        |    (rng.hi - rng.lo) // 8 AS h
        |  FROM events CROSS JOIN rng
        |  CROSS JOIN (SELECT unnest(range(3, 6)) AS k)),
        |agg AS (
        |  SELECT k - 2 AS fold,
        |    CAST(sum(CASE WHEN us < cut THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(sum(CASE WHEN us >= cut AND us < cut + h
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN us < cut THEN pur ELSE 0 END) AS BIGINT)
        |      AS p_train,
        |    CAST(sum(CASE WHEN us >= cut AND us < cut + h
        |      THEN pur ELSE 0 END) AS BIGINT) AS p_test
        |  FROM ev GROUP BY 1)
        |SELECT fold, n_train, n_test,
        |  round(CAST(p_train AS DOUBLE) / n_train, 6)
        |    AS train_purchase_rate,
        |  CASE WHEN n_test = 0 THEN NULL
        |    ELSE round(CAST(p_test AS DOUBLE) / n_test, 6) END
        |    AS test_purchase_rate
        |FROM agg ORDER BY fold""".stripMargin,

    // same per-user lead() bigrams, same once-rounded probabilities and
    // DECIMAL(18,9) entropy terms
    "q_markov_chain" ->
      """WITH s AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tr AS (
        |  SELECT cur, nxt, count(*) AS n FROM s
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur
        |        FROM tr GROUP BY 1),
        |p AS (
        |  SELECT tr.cur, tr.nxt, tr.n, tot.n_cur,
        |    round(CAST(tr.n AS DOUBLE) / tot.n_cur, 6) AS p
        |  FROM tr JOIN tot USING (cur)),
        |ent AS (
        |  SELECT cur, round(CAST(sum(CAST(round(
        |    -(n / n_cur * ln(n / n_cur)), 9) AS DECIMAL(18,9)))
        |    AS DOUBLE), 6) AS h
        |  FROM p GROUP BY cur)
        |SELECT p.cur, p.nxt, p.n, p.p, ent.h AS h_cur
        |FROM p JOIN ent USING (cur)
        |ORDER BY p.cur, p.nxt""".stripMargin,

    // same day-level reduction, same deviation products rounded to
    // DECIMAL(18,9), same per-lag join on the tiny day relation
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    sum(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |mom AS (SELECT count(*) AS nd, sum(x) AS sx FROM daily),
        |dev AS (
        |  SELECT d, CAST(x AS DOUBLE) - CAST(mom.sx AS DOUBLE) / mom.nd
        |    AS e
        |  FROM daily CROSS JOIN mom),
        |den AS (
        |  SELECT sum(CAST(round(e * e, 9) AS DECIMAL(18,9))) AS den
        |  FROM dev),
        |lg AS (
        |  SELECT CAST(date_diff('day', b.d, a.d) AS INT) AS lag,
        |    count(*) AS n_pairs,
        |    sum(CAST(round(a.e * b.e, 9) AS DECIMAL(18,9))) AS num
        |  FROM dev a JOIN dev b
        |    ON date_diff('day', b.d, a.d) BETWEEN 1 AND 7
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  round(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
        |FROM lg CROSS JOIN den ORDER BY lag""".stripMargin,

    // same frozen logistic propensity, same quantile_cont quintile cuts
    // rounded before comparison, same zero-arm NULL guards
    "q_propensity" ->
      """WITH users AS (
        |  SELECT user_id, count(*) AS n_ev,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS y,
        |    user_id % 2 = 0 AS treated
        |  FROM events GROUP BY user_id),
        |u2 AS (
        |  SELECT *, round(1.0 / (1.0 + exp((20.0 - n_ev) / 10.0)), 6)
        |    AS score
        |  FROM users),
        |cuts AS (
        |  SELECT list_transform(
        |    quantile_cont(score, [0.2, 0.4, 0.6, 0.8]),
        |    x -> round(x, 6)) AS sc
        |  FROM u2),
        |tot AS (SELECT count(*) AS n_all FROM u2),
        |strat AS (
        |  SELECT u2.treated, u2.y,
        |    1 + CAST(u2.score > k.sc[1] AS INT)
        |      + CAST(u2.score > k.sc[2] AS INT)
        |      + CAST(u2.score > k.sc[3] AS INT)
        |      + CAST(u2.score > k.sc[4] AS INT) AS stratum
        |  FROM u2 CROSS JOIN cuts k),
        |agg AS (
        |  SELECT stratum, count(*) AS n,
        |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treated,
        |    CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_control,
        |    CAST(sum(CASE WHEN treated THEN y ELSE 0 END) AS BIGINT)
        |      AS y1,
        |    CAST(sum(CASE WHEN treated THEN 0 ELSE y END) AS BIGINT)
        |      AS y0
        |  FROM strat GROUP BY 1)
        |SELECT stratum, n, n_treated, n_control,
        |  CASE WHEN n_treated = 0 THEN NULL
        |    ELSE round(CAST(y1 AS DOUBLE) / n_treated, 6) END AS y1_rate,
        |  CASE WHEN n_control = 0 THEN NULL
        |    ELSE round(CAST(y0 AS DOUBLE) / n_control, 6) END AS y0_rate,
        |  CASE WHEN n_treated = 0 OR n_control = 0 THEN NULL
        |    ELSE round(CAST(y1 AS DOUBLE) / n_treated
        |      - CAST(y0 AS DOUBLE) / n_control, 6) END AS diff,
        |  round(CAST(n AS DOUBLE) / tot.n_all, 6) AS weight
        |FROM agg CROSS JOIN tot
        |ORDER BY stratum""".stripMargin,

    // same user-day purchase×touch join, same 40/20/40 credit grid with
    // DECIMAL(18,9)/(18,6) pre-sum rounding, same 'none' bucket
    "q_attribution_u" ->
      """WITH pur AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, ts AS p_ts,
        |    event_id AS p_id, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |tou AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, ts AS t_ts,
        |    event_id AS t_id, event_type AS channel
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT pur.p_id, pur.v, tou.channel, tou.t_ts, tou.t_id
        |  FROM pur JOIN tou USING (user_id, d)
        |  WHERE tou.t_ts < pur.p_ts),
        |k AS (
        |  SELECT p_id, v, channel,
        |    row_number() OVER (PARTITION BY p_id
        |      ORDER BY t_ts, t_id) AS k,
        |    count(*) OVER (PARTITION BY p_id) AS n_t
        |  FROM j),
        |cr AS (
        |  SELECT p_id, channel, v,
        |    CAST(round(CASE
        |      WHEN n_t = 1 THEN 1.0
        |      WHEN n_t = 2 THEN 0.5
        |      WHEN k = 1 OR k = n_t THEN 0.4
        |      ELSE 0.2 / (n_t - 2) END, 9) AS DECIMAL(18,9)) AS credit
        |  FROM k),
        |att AS (
        |  SELECT channel, count(*) AS n_events,
        |    round(CAST(sum(CAST(round(CAST(credit * v AS DOUBLE), 6)
        |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS value_credited
        |  FROM cr GROUP BY 1),
        |none_row AS (
        |  SELECT 'none' AS channel, count(*) AS n_events,
        |    round(COALESCE(CAST(sum(v) AS DOUBLE), 0.0), 6)
        |      AS value_credited
        |  FROM pur WHERE p_id NOT IN (SELECT DISTINCT p_id FROM cr))
        |SELECT * FROM (SELECT * FROM att UNION ALL
        |  SELECT * FROM none_row)
        |ORDER BY channel""".stripMargin,

    // same type×hour cells, same lift-style independence index
    "q_seasonality" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
        |       FROM cells GROUP BY 1),
        |bh AS (SELECT hr, CAST(sum(n) AS BIGINT) AS n_hr
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_type) AS BIGINT) AS n_all FROM bt)
        |SELECT c.event_type, c.hr, c.n,
        |  round(CAST(c.n AS DOUBLE) * tot.n_all
        |    / (CAST(bt.n_type AS DOUBLE) * bh.n_hr), 6) AS idx
        |FROM cells c JOIN bt USING (event_type) JOIN bh USING (hr)
        |CROSS JOIN tot
        |ORDER BY c.event_type, c.hr""".stripMargin,

    // same user-day episodes, same once-rounded gamma powers, exact
    // decimal suffix sums, same tabular baseline and advantage summary
    "q_returns" ->
      """WITH s0 AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id,
        |    event_type,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END AS r
        |  FROM events),
        |s1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, d
        |    ORDER BY ts, event_id) - 1 AS k
        |  FROM s0),
        |s2 AS (
        |  SELECT *, CAST(round(pow(0.9, k), 9) AS DECIMAL(18,9)) AS gk
        |  FROM s1),
        |s3 AS (
        |  SELECT event_type, gk,
        |    sum(gk * r) OVER (PARTITION BY user_id, d
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf
        |  FROM s2),
        |s4 AS (
        |  SELECT event_type,
        |    round(CAST(suf AS DOUBLE) / CAST(gk AS DOUBLE), 6) AS g
        |  FROM s3 WHERE gk > 0),
        |base AS (
        |  SELECT event_type, count(*) AS n_steps,
        |    round(CAST(sum(CAST(g AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS baseline
        |  FROM s4 GROUP BY 1)
        |SELECT s4.event_type, base.n_steps, base.baseline,
        |  min(round(g - baseline, 6)) AS min_adv,
        |  max(round(g - baseline, 6)) AS max_adv,
        |  round(CAST(sum(CAST(abs(round(g - baseline, 6))
        |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_abs_adv
        |FROM s4 JOIN base USING (event_type)
        |GROUP BY 1, 2, 3
        |ORDER BY s4.event_type""".stripMargin,

    // same lifetime/censoring definitions, same DECIMAL(18,9) pre-sum
    // ln terms, same absorbed short-circuit; HUGEINT sums cast to BIGINT
    // same lifetime/censoring definitions, same DECIMAL(18,9) pre-sum
    // ln terms, same absorbed short-circuit; HUGEINT sums cast to BIGINT
    
    // same user-day unit as q_abtest; midpoint period split from the
    // observed date range; four binomial cells and one closed form
    "q_did" ->
      """WITH u AS (
        |  SELECT user_id % 2 = 0 AS a, CAST(ts AS DATE) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |lim AS (SELECT min(day) AS d0, max(day) AS d1 FROM u),
        |cells AS (
        |  SELECT a,
        |    date_diff('day', d0, day)
        |      > date_diff('day', d0, d1) // 2 AS late, conv
        |  FROM u CROSS JOIN lim),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN NOT a AND NOT late THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00,
        |    CAST(sum(CASE WHEN NOT a AND NOT late THEN conv ELSE 0 END)
        |      AS BIGINT) AS c00,
        |    CAST(sum(CASE WHEN NOT a AND late THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN NOT a AND late THEN conv ELSE 0 END)
        |      AS BIGINT) AS c01,
        |    CAST(sum(CASE WHEN a AND NOT late THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN a AND NOT late THEN conv ELSE 0 END)
        |      AS BIGINT) AS c10,
        |    CAST(sum(CASE WHEN a AND late THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN a AND late THEN conv ELSE 0 END)
        |      AS BIGINT) AS c11
        |  FROM cells),
        |f AS (
        |  SELECT n00, n01, n10, n11,
        |    CAST(c00 AS DOUBLE) / n00 AS p00,
        |    CAST(c01 AS DOUBLE) / n01 AS p01,
        |    CAST(c10 AS DOUBLE) / n10 AS p10,
        |    CAST(c11 AS DOUBLE) / n11 AS p11,
        |    (CAST(c11 AS DOUBLE) / n11 - CAST(c10 AS DOUBLE) / n10)
        |      - (CAST(c01 AS DOUBLE) / n01 - CAST(c00 AS DOUBLE) / n00)
        |      AS did,
        |    sqrt(CAST(c00 AS DOUBLE) / n00
        |        * (1.0 - CAST(c00 AS DOUBLE) / n00) / n00
        |      + CAST(c01 AS DOUBLE) / n01
        |        * (1.0 - CAST(c01 AS DOUBLE) / n01) / n01
        |      + CAST(c10 AS DOUBLE) / n10
        |        * (1.0 - CAST(c10 AS DOUBLE) / n10) / n10
        |      + CAST(c11 AS DOUBLE) / n11
        |        * (1.0 - CAST(c11 AS DOUBLE) / n11) / n11) AS se
        |  FROM s)
        |SELECT n00, n01, n10, n11,
        |  round(p00, 6) AS p_ctrl_pre, round(p01, 6) AS p_ctrl_post,
        |  round(p10, 6) AS p_treat_pre, round(p11, 6) AS p_treat_post,
        |  round(did, 6) AS did, round(se, 6) AS se,
        |  round(CASE WHEN se > 0.0 THEN did / se END, 6) AS z,
        |  abs(CASE WHEN se > 0.0 THEN did / se END) > 1.96
        |    AS significant
        |FROM f""".stripMargin,

    // same duration/censoring rule as the K-M CTEs; per-time O/E/V with
    // the hypergeometric variance, terms decimal-rounded before sums
    "q_logrank" ->
      """WITH users AS (
        |  SELECT user_id % 2 = 0 AS a,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(COALESCE(min(CASE WHEN event_type = 'purchase'
        |        THEN ts END), max(ts)) AS DATE)) AS INT) AS t,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      IS NOT NULL AS churned
        |  FROM events GROUP BY user_id),
        |byt AS (
        |  SELECT t, count(*) AS m_all,
        |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_all,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS m_1,
        |    CAST(sum(CASE WHEN a AND churned THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d_1
        |  FROM users GROUP BY t),
        |n AS (SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1_users
        |  FROM users),
        |r AS (
        |  SELECT t, d_all, d_1,
        |    n.n_users - CAST(COALESCE(sum(m_all) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk,
        |    n.n1_users - CAST(COALESCE(sum(m_1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n1_risk
        |  FROM byt CROSS JOIN n),
        |terms AS (
        |  SELECT d_1,
        |    CAST(round(CAST(d_all AS DOUBLE) * n1_risk / n_risk, 9)
        |      AS DECIMAL(18,9)) AS e1,
        |    CASE WHEN n_risk > 1 THEN
        |      CAST(round(CAST(d_all AS DOUBLE)
        |        * (CAST(n1_risk AS DOUBLE) / n_risk)
        |        * (1.0 - CAST(n1_risk AS DOUBLE) / n_risk)
        |        * (CAST(n_risk - d_all AS DOUBLE) / (n_risk - 1)), 9)
        |        AS DECIMAL(18,9))
        |      ELSE CAST(0 AS DECIMAL(18,9)) END AS v
        |  FROM r WHERE d_all > 0),
        |s AS (
        |  SELECT count(*) AS n_times, CAST(sum(d_1) AS BIGINT) AS o1,
        |    sum(e1) AS e1, sum(v) AS v
        |  FROM terms)
        |SELECT n_times, o1 AS observed_1,
        |  round(CAST(e1 AS DOUBLE), 4) AS expected_1,
        |  round(CAST(v AS DOUBLE), 4) AS variance,
        |  round(CASE WHEN v > 0 THEN
        |    (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE))
        |      / sqrt(CAST(v AS DOUBLE)) END, 6) AS z,
        |  round((CASE WHEN v > 0 THEN
        |    (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE))
        |      / sqrt(CAST(v AS DOUBLE)) END) * (CASE WHEN v > 0 THEN
        |    (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE))
        |      / sqrt(CAST(v AS DOUBLE)) END), 6) AS chi2,
        |  abs(CASE WHEN v > 0 THEN
        |    (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE))
        |      / sqrt(CAST(v AS DOUBLE)) END) > 1.96 AS significant
        |FROM s""".stripMargin,

    "q_survival" ->
      (survivalCtes + """
        |SELECT t, n_risk, d_churned, c_censored, survival
        |FROM curve ORDER BY t""".stripMargin),

    // same shared K-M CTEs, same decimal pre-sum of the curve and the
    // revenue-per-active-user-day composite
    "q_ltv" ->
      (survivalCtes + """,
        |e AS (
        |  SELECT round(CAST(sum(CAST(survival AS DECIMAL(18,6)))
        |    AS DOUBLE), 6) AS exp_days, count(*) AS n_steps
        |  FROM curve),
        |rev AS (
        |  SELECT sum(CAST(value AS DECIMAL(18,2))) AS v FROM events
        |  WHERE event_type = 'purchase'),
        |ud AS (
        |  SELECT count(*) AS user_days FROM (
        |    SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events))
        |SELECT e.n_steps, e.exp_days, ud.user_days,
        |  round(CAST(rev.v AS DOUBLE), 2) AS total_rev,
        |  round(CAST(rev.v AS DOUBLE) / ud.user_days, 6) AS rev_per_ud,
        |  round(e.exp_days
        |    * round(CAST(rev.v AS DOUBLE) / ud.user_days, 6), 6)
        |    AS ltv_proxy
        |FROM e CROSS JOIN rev CROSS JOIN ud""".stripMargin),


    // same learn/eval split, same row_number argmax policy, same
    // broadcastable propensity tables and once-rounded IPS terms
    "q_offline_eval" ->
      """WITH ev AS (
        |  SELECT event_id,
        |    CAST(CAST(json_extract_string(props, '$.k') AS INT) // 25
        |      AS INT) AS ctx,
        |    event_type AS action,
        |    CAST(value AS DECIMAL(18,2)) AS r
        |  FROM events),
        |learn AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |ev2 AS (SELECT * FROM ev WHERE event_id % 2 = 1),
        |pi AS (
        |  SELECT ctx, action AS pi_action FROM (
        |    SELECT ctx, action,
        |      row_number() OVER (PARTITION BY ctx ORDER BY
        |        round(CAST(sum(r) AS DOUBLE) / count(*), 6) DESC,
        |        action ASC) AS rk
        |    FROM learn GROUP BY ctx, action)
        |  WHERE rk = 1),
        |nx AS (SELECT ctx, count(*) AS n_x FROM ev2 GROUP BY 1),
        |nax AS (SELECT ctx, action, count(*) AS n_ax
        |        FROM ev2 GROUP BY 1, 2),
        |j AS (
        |  SELECT e.ctx, pi.pi_action, e.r,
        |    e.action = pi.pi_action AS matched,
        |    CASE WHEN e.action = pi.pi_action
        |      THEN CAST(nx.n_x AS DOUBLE) / nax.n_ax ELSE 0.0 END AS w
        |  FROM ev2 e
        |  JOIN pi ON pi.ctx = e.ctx
        |  JOIN nax ON nax.ctx = e.ctx AND nax.action = e.action
        |  JOIN nx ON nx.ctx = e.ctx),
        |g AS (
        |  SELECT ctx, pi_action, count(*) AS n_eval,
        |    CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_match,
        |    sum(r) AS logged_sum,
        |    sum(CAST(round(CAST(r AS DOUBLE) * w, 6) AS DECIMAL(18,6)))
        |      AS ips_sum,
        |    sum(CAST(round(w, 6) AS DECIMAL(18,6))) AS w_sum
        |  FROM j GROUP BY 1, 2)
        |SELECT ctx, pi_action, n_eval, n_match,
        |  round(CAST(logged_sum AS DOUBLE) / n_eval, 6) AS logged_avg,
        |  round(CAST(ips_sum AS DOUBLE) / n_eval, 6) AS ips_value,
        |  CASE WHEN w_sum = 0 THEN NULL
        |    ELSE round(CAST(ips_sum AS DOUBLE) / CAST(w_sum AS DOUBLE), 6)
        |  END AS snips_value
        |FROM g ORDER BY ctx""".stripMargin,

    // same user-day conversion collapse, same single conditional
    // aggregate and shared pooled-SE z formula rounded once; zero-SE
    // degenerate case NULL-guarded on both sides
    "q_abtest" ->
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT user_id % 2 = 0 AS a, conv FROM u),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN a THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN NOT a THEN conv ELSE 0 END) AS BIGINT)
        |      AS c_b
        |  FROM v),
        |f AS (
        |  SELECT n_a, c_a, n_b, c_b,
        |    CAST(c_a AS DOUBLE) / n_a AS pa,
        |    CAST(c_b AS DOUBLE) / n_b AS pb,
        |    (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b) AS se2
        |  FROM s)
        |SELECT n_a, c_a, n_b, c_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round(CASE WHEN se2 = 0.0 THEN NULL
        |    ELSE (pa - pb) / sqrt(se2) END, 6) AS z,
        |  abs(CASE WHEN se2 = 0.0 THEN NULL
        |    ELSE (pa - pb) / sqrt(se2) END) > 1.96 AS significant
        |FROM f""".stripMargin,

    // same gaps-and-islands sessionization (lag + RANGE-framed running
    // sum — tie-safe in both engines), same strictly-after staged gates
    // ns-precision ts truncates to µs on the Spark read; the oracle casts
    // through epoch_us so both engines compare the same microsecond values
    "q_split_temporal" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
        |         WHEN ts >= TIMESTAMP '2024-01-21 00:00:00' THEN 'test'
        |         ELSE 'embargo' END AS split
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  CAST(SUM(CASE WHEN split = 'embargo' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_embargo,
        |  CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  max(CASE WHEN split = 'train' THEN ts END) AS train_max_ts,
        |  min(CASE WHEN split = 'test' THEN ts END) AS test_min_ts
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same gaps-and-islands sessionization, (ts, event_id)-tie-safe;
    // string_agg with an explicit ORDER BY mirrors the sorted-struct fold
    // same 2-step lead pass over (ts, event_id)-ordered user histories;
    // distinct-per-user supports; top-20 with the full total order
    "q_seq_mining" ->
      """WITH led AS (
        |  SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS c
        |  FROM events),
        |tri AS (
        |  SELECT a, b, c, count(*) AS support FROM (
        |    SELECT DISTINCT user_id, a, b, c FROM led
        |    WHERE c IS NOT NULL)
        |  GROUP BY 1, 2, 3),
        |bi AS (
        |  SELECT a, b, count(*) AS sup_ab FROM (
        |    SELECT DISTINCT user_id, a, b FROM led
        |    WHERE b IS NOT NULL)
        |  GROUP BY 1, 2),
        |nu AS (
        |  SELECT count(*) AS n_users FROM (
        |    SELECT DISTINCT user_id FROM led))
        |SELECT a, b, c, support,
        |  round(CAST(support AS DOUBLE) / sup_ab, 6) AS confidence,
        |  round(CAST(support AS DOUBLE) / n_users, 6) AS coverage
        |FROM tri JOIN bi USING (a, b) CROSS JOIN nu
        |WHERE support >= 5
        |ORDER BY support DESC, a, b, c LIMIT 20""".stripMargin,

    // exact microsecond-integer gap moments; decimal squares (BIGINT
    // would overflow at day-scale gaps); one shared closed form
    "q_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |      AS g
        |  FROM events),
        |s AS (
        |  SELECT event_type, count(*) AS n_gaps,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    sum(CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0)))
        |      AS sgg
        |  FROM g WHERE g IS NOT NULL GROUP BY 1),
        |f AS (
        |  SELECT event_type, n_gaps,
        |    CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean,
        |    sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |      - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |        * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
        |      / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS cv
        |  FROM s)
        |SELECT event_type, n_gaps,
        |  round(mean / 1000000.0, 3) AS mean_gap_s,
        |  round(cv, 6) AS cv,
        |  round(3600.0 * 1000000.0 / mean, 4) AS rate_per_hour,
        |  cv > 1.2 AS bursty
        |FROM f ORDER BY event_type""".stripMargin,

    "q_journeys" ->
      """WITH l AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |n AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) >= 600000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM n),
        |p AS (
        |  SELECT user_id, sid, count(*) AS steps,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, steps, count(*) AS n_sessions
        |FROM p GROUP BY path, steps
        |ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin,

    "q_funnel_sessions" ->
      """WITH l AS (
        |  SELECT user_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |n AS (
        |  SELECT user_id, event_type, ts,
        |    CASE WHEN prev IS NULL
        |      OR epoch_us(ts) - epoch_us(prev) >= 600000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |s AS (
        |  SELECT user_id, event_type, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM n),
        |v AS (
        |  SELECT user_id, sid, min(ts) AS t1 FROM s
        |  WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT s.user_id, s.sid, min(s.ts) AS t2, min(v.t1) AS t1
        |  FROM s JOIN v ON v.user_id = s.user_id AND v.sid = s.sid
        |  WHERE s.event_type = 'click' AND s.ts > v.t1
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT s.user_id, s.sid, min(s.ts) AS t3, min(c.t2) AS t2
        |  FROM s JOIN c ON c.user_id = s.user_id AND c.sid = s.sid
        |  WHERE s.event_type = 'purchase' AND s.ts > c.t2
        |  GROUP BY 1, 2)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        |  count(*) AS n_sessions, CAST(NULL AS DOUBLE) AS avg_gap_us FROM v
        |UNION ALL
        |SELECT 2, 'click', count(*),
        |  round(CAST(sum(epoch_us(t2) - epoch_us(t1)) AS DOUBLE)
        |    / count(*), 6) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', count(*),
        |  round(CAST(sum(epoch_us(t3) - epoch_us(t2)) AS DOUBLE)
        |    / count(*), 6) FROM p
        |ORDER BY stage""".stripMargin,

    // same strictly-after chaining; epoch_us mirrors unix_micros in the
    // UTC session; mean gap = one double division of exact integer sums
    "q_funnel_staged" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND epoch_us(e.ts) - epoch_us(v.t1) <= 86400000000
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |    AND epoch_us(e.ts) - epoch_us(c.t2) <= 86400000000
        |  GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        |  count(*) AS n_users, CAST(NULL AS DOUBLE) AS avg_gap_us FROM v
        |UNION ALL
        |SELECT 2, 'click', count(*),
        |  round(CAST(sum(epoch_us(t2) - epoch_us(t1)) AS DOUBLE)
        |    / count(*), 6) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', count(*),
        |  round(CAST(sum(epoch_us(t3) - epoch_us(t2)) AS DOUBLE)
        |    / count(*), 6) FROM p
        |ORDER BY stage""".stripMargin,

    // same change-detection lag + interval-closing lead over the change
    // rows, same (ts, event_id) total order
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type AS state,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts, state FROM e
        |  WHERE prev IS NULL OR prev != state),
        |v AS (
        |  SELECT user_id, state, ts AS valid_from,
        |    lead(ts, 1) OVER w AS valid_to,
        |    row_number() OVER w AS version
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(version AS INT) AS version, state,
        |  valid_from, valid_to, valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // same per-user lag ladder in the same (ts, event_id) total order;
    // concat_ws is NULL-skipping in both engines but the l5 filter makes
    // every context exactly 5 tokens anyway
    "q_seq_examples" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type, 1) OVER w AS l1,
        |    lag(event_type, 2) OVER w AS l2,
        |    lag(event_type, 3) OVER w AS l3,
        |    lag(event_type, 4) OVER w AS l4,
        |    lag(event_type, 5) OVER w AS l5
        |  FROM events WHERE user_id % 20 = 0
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id,
        |  concat_ws(' ', l5, l4, l3, l2, l1) AS context,
        |  event_type AS label
        |FROM e WHERE l5 IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,

    // same SCD-2 interval CTEs, then the identical half-open containment
    // join keyed on user_id
    "q_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type AS state,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts, state FROM e
        |  WHERE prev IS NULL OR prev != state),
        |v AS (
        |  SELECT user_id, state, ts AS valid_from,
        |    lead(ts, 1) OVER w AS valid_to,
        |    row_number() OVER w AS version
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.state AS state_at_purchase,
        |  CAST(v.version AS INT) AS state_version,
        |  v.valid_from AS state_since
        |FROM events p
        |JOIN v ON v.user_id = p.user_id
        |  AND v.valid_from <= p.ts
        |  AND (v.valid_to IS NULL OR p.ts < v.valid_to)
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    // same preceding-frame decimal sums (exact integers however the
    // engine incrementalizes frames), same shared mu/sd/z double formula,
    // same CASE-guarded sd (NULL z on zero-variance prefixes — never
    // sqrt(negative), never Inf), same (ts, v, event_id) tie order
    "q_anomaly_running" ->
      """WITH e AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_id, event_type, v,
        |    count(*) OVER w AS np,
        |    SUM(v) OVER w AS sx,
        |    SUM(v * v) OVER w AS sx2
        |  FROM e
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, v, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT event_id, event_type, v, np, sx,
        |    (CAST(sx2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / np)
        |      / (np - 1) AS vr
        |  FROM r WHERE np >= 30),
        |z AS (
        |  SELECT event_id, event_type, CAST(v AS DOUBLE) AS value,
        |    round((CAST(v AS DOUBLE) - CAST(sx AS DOUBLE) / np)
        |      / (CASE WHEN vr > 0 THEN sqrt(vr) END), 6) AS z,
        |    np AS n_seen
        |  FROM g)
        |SELECT event_id, event_type, value, z, n_seen
        |FROM z WHERE abs(z) > 3.0
        |ORDER BY event_id""".stripMargin,

    // same IGNORE NULLS last_value window, same (ts, event_id) total
    // order; epoch_us mirrors Spark's unix_micros in the UTC session
    "q_attribution" ->
      """WITH a AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END
        |      IGNORE NULLS) OVER w AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts END
        |      IGNORE NULLS) OVER w AS click_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, click_id,
        |  epoch_us(ts) - epoch_us(click_ts) AS gap_us
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_tumbling" ->
      s"""SELECT $bucket5m AS w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,

    "q_sliding" ->
      s"""WITH base AS (
        |  SELECT $bucket5m AS b, event_type FROM events),
        |expanded AS (
        |  SELECT b AS w_start, event_type FROM base
        |  UNION ALL
        |  SELECT b - INTERVAL 5 MINUTE AS w_start, event_type FROM base)
        |SELECT w_start, event_type, COUNT(*) AS n
        |FROM expanded
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,

    // same exact-integer cumulative counts, same z / boundary forms
    "q_obrien_fleming" ->
      """WITH units AS (
        |  SELECT user_id % 2 = 0 AS a, CAST(ts AS DATE) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |daily AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN a THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE conv END) AS BIGINT) AS c_b
        |  FROM units GROUP BY day),
        |cum AS (
        |  SELECT day,
        |    CAST(sum(n_a) OVER w AS BIGINT) AS na,
        |    CAST(sum(c_a) OVER w AS BIGINT) AS ca,
        |    CAST(sum(n_b) OVER w AS BIGINT) AS nb,
        |    CAST(sum(c_b) OVER w AS BIGINT) AS cb,
        |    date_diff('day', DATE '2024-01-01', day) + 1 AS di
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |f AS (
        |  SELECT CAST(di / 6 AS BIGINT) AS look, day,
        |    na, nb, na + nb AS n_cum,
        |    CAST(ca AS DOUBLE) / na AS pa,
        |    CAST(cb AS DOUBLE) / nb AS pb,
        |    CAST(ca + cb AS DOUBLE) / (na + nb) AS pp
        |  FROM cum WHERE di % 6 = 0),
        |g AS (
        |  SELECT look, day, n_cum,
        |    pp * (1.0 - pp) * (1.0 / na + 1.0 / nb) AS se2,
        |    pa, pb, 2.04 * sqrt(5.0 / CAST(look AS DOUBLE)) AS bound
        |  FROM f)
        |SELECT look, day, n_cum,
        |  round(CASE WHEN se2 > 0.0 THEN (pa - pb) / sqrt(se2) END, 6)
        |    AS z,
        |  round(bound, 6) AS boundary,
        |  CASE WHEN se2 > 0.0
        |    THEN abs((pa - pb) / sqrt(se2)) > bound END AS crossed
        |FROM g ORDER BY look""".stripMargin,

    // same island key, same tie-breaks, same top-20
    "q_streaks" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id, count(*) AS len, min(d) AS start
        |  FROM (
        |    SELECT user_id, d,
        |      date_diff('day', DATE '2024-01-01', d)
        |        - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |        AS g
        |    FROM act)
        |  GROUP BY user_id, g),
        |rk AS (
        |  SELECT user_id, len, start,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start ASC) AS rk
        |  FROM isl)
        |SELECT user_id,
        |  CAST(max(CASE WHEN rk = 1 THEN len END) AS BIGINT)
        |    AS longest_streak,
        |  max(CASE WHEN rk = 1 THEN start END) AS streak_start,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM rk GROUP BY user_id
        |ORDER BY longest_streak DESC, user_id ASC LIMIT 20""".stripMargin,

    "q_session" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            > INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS s_start,
        |  MAX(ts) + INTERVAL 10 MINUTE AS s_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    "q_dedup_events" ->
      """SELECT 2 * COUNT(*) AS n_before, COUNT(DISTINCT event_id) AS n_after
        |FROM events""".stripMargin,

    // floor(epoch) truncation == Spark's CAST(ts AS LONG) for positive
    // epochs; generate_series is end-inclusive like Spark's sequence;
    // the forward fill carries an exact DECIMAL so values can't drift
    "q_resample" ->
      """WITH a AS (
        |  SELECT user_id,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS e,
        |    CAST(count(*) AS INT) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events WHERE user_id % 50 = 0
        |  GROUP BY 1, 2),
        |sp AS (
        |  SELECT user_id, unnest(generate_series(e0, e1, 3600)) AS e
        |  FROM (SELECT user_id, min(e) AS e0, max(e) AS e1
        |        FROM a GROUP BY 1)),
        |j AS (SELECT sp.user_id, sp.e, a.n, a.sv
        |      FROM sp LEFT JOIN a USING (user_id, e))
        |SELECT user_id, make_timestamp(e * 1000000) AS h,
        |  COALESCE(n, 0) AS n,
        |  CAST(last_value(sv IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS filled_sum,
        |  n IS NULL AS is_gap
        |FROM j ORDER BY user_id, h""".stripMargin,

    // integer week buckets from the fixture epoch (no date_trunc week-
    // start convention), distinct user×week grain, broadcast cohort sizes
    "q_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0)
        |      AS INT) AS wk
        |  FROM events),
        |first AS (
        |  SELECT user_id, min(wk) AS cwk FROM act GROUP BY 1),
        |sizes AS (
        |  SELECT cwk, count(*) AS cohort_size FROM first GROUP BY 1),
        |grid AS (
        |  SELECT f.cwk, a.wk - f.cwk AS week_offset,
        |    count(*) AS n_active
        |  FROM act a JOIN first f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT g.cwk AS cohort_week, g.week_offset, s.cohort_size,
        |  g.n_active,
        |  round(CAST(g.n_active AS DOUBLE) / s.cohort_size, 6)
        |    AS retention
        |FROM grid g JOIN sizes s ON g.cwk = s.cwk
        |ORDER BY cohort_week, week_offset""".stripMargin
  )
}
