package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._
import graft.queries.Tables

/** Product-analytics operators over the `events` changelog: cohort
  * retention, ordered funnels, and statistical outlier detection — the
  * queries a training-data pipeline's telemetry side runs at the same
  * 100 TB scale as the corpus side.
  *
  * Scale shapes:
  *  - retention aggregates once per `user_id` (day-set bounded by the
  *    calendar, not the event count) and once per (cohort, offset) —
  *    never a `count(distinct)` over raw events;
  *  - the funnel chains per-user conditional minima through joins that
  *    all hash on `user_id`, so AQE reuses one exchange layout;
  *  - anomaly scoring derives per-type moments from exact DECIMAL sums
  *    (partition-order-independent, [[ChFunctions.dsum]]) and broadcasts
  *    the handful of group rows back over the scan — z-scoring is a pure
  *    map stage.
  */
object EventAnalytics {

  /** x62: daily cohort retention. Cohort = day of a user's first event;
    * a cohort's day-`k` retention = fraction of its users active `k`
    * days later.
    *
    * One shuffle on `user_id` builds `(cohort_day, active-day set)` per
    * user — `collect_set` is safe here because its cardinality is
    * bounded by the calendar span (≤ a few thousand days), not by the
    * user's event count. The explode emits user×active-day rows (the
    * same volume a distinct would shuffle, but already deduplicated
    * map-side), and the final count per (cohort, offset) is a partial
    * aggregation. Cohort sizes reuse the per-user relation; the
    * cohort-size join is a broadcast (one row per calendar day). */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame =
    retentionFrom(Tables.events(spark, sfDir))

  /** [[retentionCohorts]] over an arbitrary events relation. */
  private[graft] def retentionFrom(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("days"))
    val sizes = perUser.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    perUser
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_users").cast("double"))
      .select("cohort_day", "day_offset", "n_active", "cohort_users",
        "retention")
      .orderBy("cohort_day", "day_offset")
  }

  /** The ordered funnel stages for [[funnel]]. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** x63: strictly-ordered funnel — users who did `view`, then `click`
    * AFTER their first view, then `purchase` after that click. Each
    * stage is a per-user conditional minimum: stage k's relation joins
    * stage k−1's first-completion time and takes `min(ts)` over later
    * events of the next type. Every join and aggregation hashes on
    * `user_id`, so the whole chain reuses one shuffle layout; stage
    * relations shrink monotonically. Emits one row per stage with the
    * surviving-user count and the conversion fraction vs stage 1.
    *
    * Skew stance: unlike the window family (q14/x91), a hot user costs
    * ~nothing here — every per-user reduction is a commutative `min`,
    * so a 10⁸-event bot partial-aggregates to ONE row map-side before
    * any exchange; the joins then move one row per user per stage.
    * EventAnalyticsSpec's pathological-user fixture covers this path
    * too. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelFrom(Tables.events(spark, sfDir))

  /** [[funnel]] over an arbitrary events relation. */
  private[graft] def funnelFrom(events: DataFrame): DataFrame = {
    val ev = events.select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === FunnelStages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t_prev"))
    val stages = FunnelStages.tail.scanLeft(s1) { (prev, stage) =>
      ev.filter(col("event_type") === stage)
        .join(prev, "user_id")
        .filter(col("ts") > col("t_prev"))
        .groupBy("user_id").agg(min(col("ts")).as("t_prev"))
    }
    val counts = stages.zip(FunnelStages).zipWithIndex.map {
      case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("stage_idx"),
            lit(stage).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("stage_idx") === 1)
      .select(col("n_users").as("n_first"))
    counts.crossJoin(broadcast(first))
      .withColumn("frac_of_first",
        col("n_users").cast("double") / col("n_first").cast("double"))
      .select("stage_idx", "stage", "n_users", "frac_of_first")
      .orderBy("stage_idx")
  }

  /** z-score magnitude above which [[valueAnomalies]] flags an event. */
  val AnomalyZ = 3.0

  /** x64: per-type statistical outliers — events whose `value` sits more
    * than [[AnomalyZ]] sample standard deviations from their type's
    * mean. The moments pass aggregates Σv and Σv² through exact DECIMAL
    * accumulators (one partial agg over the scan; results independent of
    * partition merge order), mean/variance/σ are then a fixed double
    * expression over those exact sums — bit-identical on any cluster
    * size and to the DuckDB oracle, which mirrors the same expression
    * tree. The per-type stats broadcast back over the scan, so scoring
    * and the |z| filter are one map stage with full pushdown. */
  def valueAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    valueAnomaliesFrom(Tables.events(spark, sfDir))

  /** [[valueAnomalies]] over an arbitrary events relation. */
  private[graft] def valueAnomaliesFrom(events: DataFrame): DataFrame = {
    val stats = events.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("s1"),
        dsum(col("value") * col("value")).as("s2"))
      .withColumn("mean", col("s1") / col("n").cast("double"))
      .withColumn("sd", sqrt(
        (col("s2") - col("s1") * col("s1") / col("n").cast("double")) /
          (col("n") - 1).cast("double")))
      .select("event_type", "mean", "sd")
    events
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > AnomalyZ)
      .select("event_id", "event_type", "value", "mean", "sd", "z")
      .orderBy("event_type", "event_id")
  }

  /** x91: first-order MARKOV TRANSITIONS between event types — for each
    * (from, to) pair, how many times a user's NEXT event (by event time,
    * q14's (ts, event_id) total order) was `to` given `from`, and the
    * conditional probability. The behavioral fingerprint x63's fixed
    * funnel cannot see: funnels check ONE prescribed path, the
    * transition matrix surfaces every path and its mass (and a drifting
    * matrix between corpus snapshots is a cheap instrumentation alarm).
    *
    * Scale shape: ONE user-keyed exchange for the lead() window (the
    * q14 layout — per-user sequences sort within their partition and
    * spill to disk, never into task memory); everything after is
    * |types|²-bounded aggregation, and the row-count normalizer is a
    * broadcast of that bounded aggregate. p = one double division of
    * exact longs per pair — hash-exact.
    *
    * Skew boundary: q14's (see
    * [[graft.queries.Relational.sessionize]]) — a pathological user
    * serializes into one spilling task sort (straggler, not OOM;
    * EventAnalyticsSpec proves the 10⁶-event single-user fixture).
    * Unlike q14, everything ABOVE the window is a commutative count, so
    * if the straggler matters the lead() can be reformulated over
    * q19-salted (user, time-bucket) shards with per-boundary stitching;
    * the plain window is kept because a transition count's single sort
    * is cheap relative to the scan at any realistic skew. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame =
    eventTransitionsFrom(Tables.events(spark, sfDir))

  /** [[eventTransitions]] over an arbitrary events relation — the
    * testable core (fixtures pin a hand-built two-user sequence). */
  private[graft] def eventTransitionsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n_transitions")).as("from_total"))
    counts.join(broadcast(totals), "from_type")
      .withColumn("p_transition",
        col("n_transitions").cast("double") / col("from_total").cast("double"))
      .select("from_type", "to_type", "n_transitions", "from_total",
        "p_transition")
      .orderBy("from_type", "to_type")
  }
}
