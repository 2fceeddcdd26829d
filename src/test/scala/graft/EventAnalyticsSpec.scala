package graft

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Fixture-level semantics for the event-analytics battery (x62–x64):
  * cohort/offset bookkeeping, funnel ordering strictness, and anomaly
  * moment determinism. Value-exactness at corpus scale is gated by the
  * DuckDB oracles; these pin the edge rules the oracle corpus cannot
  * isolate. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec") * 86400L))
      .drop("sec")

  test("retention: cohort = first day; offset 0 always present; gaps preserved; sizes denominate") {
    // user 1: days 0, 2 (cohort day0); user 2: days 0, 1; user 3: day 2
    val out = EventAnalytics.retentionFrom(ev(
      (1L, 0L, 1L, "view", 0.0), (2L, 2L, 1L, "view", 0.0),
      (3L, 0L, 2L, "view", 0.0), (4L, 1L, 2L, "view", 0.0),
      (5L, 0L, 2L, "view", 0.0), // same user+day twice → still one active
      (6L, 2L, 3L, "view", 0.0)
    )).select("cohort_day", "day_offset", "n_active", "cohort_users",
      "retention").as[(java.sql.Timestamp, Long, Long, Long, Double)]
      .collect().map { case (c, o, a, u, r) => (c.getTime / 86400000L, o, a, u, r) }
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),   // day-0 cohort: users 1,2 both active day 0
      (0L, 1L, 1L, 2L, 0.5),   // only user 2 back on day 1
      (0L, 2L, 1L, 2L, 0.5),   // only user 1 back on day 2
      (2L, 0L, 1L, 1L, 1.0)))  // day-2 cohort: user 3
  }

  test("funnel: stages must be strictly ordered in time; ties and reversed order do not convert") {
    val out = EventAnalytics.funnelFrom(ev(
      // user 1: full ordered funnel view@1 < click@2 < purchase@3
      (1L, 1L, 1L, "view", 0.0), (2L, 2L, 1L, "click", 0.0),
      (3L, 3L, 1L, "purchase", 0.0),
      // user 2: click BEFORE first view → no stage-2 conversion
      (4L, 2L, 2L, "click", 0.0), (5L, 3L, 2L, "view", 0.0),
      // user 3: click ties the first view timestamp → strict > fails
      (6L, 1L, 3L, "view", 0.0), (7L, 1L, 3L, "click", 0.0),
      // user 4: view then click, purchase before the click → stage 2 only
      (8L, 1L, 4L, "purchase", 0.0), (9L, 2L, 4L, "view", 0.0),
      (10L, 3L, 4L, "click", 0.0)
    )).select("stage_idx", "stage", "n_users", "frac_of_first")
      .as[(Long, String, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, "view", 4L, 1.0),
      (2L, "click", 2L, 0.5),     // users 1 and 4
      (3L, "purchase", 1L, 0.25)) // user 1 only
    )
  }

  test("funnel: a later view can still anchor a conversion (min over events AFTER the first view)") {
    // user's first view@5; click@3 precedes it, click@6 follows → converts
    val out = EventAnalytics.funnelFrom(ev(
      (1L, 5L, 1L, "view", 0.0), (2L, 3L, 1L, "click", 0.0),
      (3L, 6L, 1L, "click", 0.0)))
      .select("stage_idx", "n_users").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 0L)
  }

  test("anomaly: exact moments; only |z| > 3 rows flagged; partition-order independent") {
    // type "a": 100 values at 0 plus one at 100 → huge z for the spike
    val base = (1L to 100L).map(i => (i, i % 7, 1L, "a", 0.0))
    val spike = Seq((101L, 3L, 1L, "a", 100.0))
    val out = EventAnalytics.valueAnomaliesFrom(ev((base ++ spike): _*))
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(out.length === 1 && out.head._1 === 101L)
    assert(out.head._2 > 3.0)
    // repartitioned input yields bit-identical z (exact decimal moments)
    val out2 = EventAnalytics.valueAnomaliesFrom(
      ev((base ++ spike): _*).repartition(7))
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(out2.toSeq === out.toSeq)
  }

  test("pathological user: 10^6 events on ONE user_id complete with exact " +
      "results through the per-user window family (q14/x91/x63)") {
    // The skew fixture the scaladoc boundaries point at
    // (Relational.sessionize / EventAnalytics.eventTransitions): one
    // user's whole history serializes into a single task's window sort.
    // This proves the family COMPLETES there (Spark's external sort
    // spills, it does not OOM) and that the results stay exact — the
    // 100 TB pathological-bot case differs only in straggler latency.
    val n = 1000000L
    // types cycle view→click→purchase; a >30 min gap every 100k events
    // splits exactly 10 sessions of 100k
    val events = spark.range(n).select(
      col("id").as("event_id"),
      lit(7L).as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      timestamp_seconds(lit(1700000000L) + col("id") +
        (col("id") / 100000).cast("long") * lit(3600L)).as("ts"),
      lit(1.0).as("value"))
    val sessions = graft.queries.Relational.sessionizeFrom(events)
      .select("session_seq", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect()
    assert(sessions.length === 10)
    assert(sessions.map(_._1).toSeq === (1L to 10L))
    assert(sessions.forall(s => s._2 === 100000L && s._3 === 100000.0))
    // transitions: ts strictly increasing with id, so every from-type's
    // next event is fully determined by the cycle — p = 1.0 exactly
    val trans = EventAnalytics.eventTransitionsFrom(events)
      .select("from_type", "to_type", "n_transitions", "p_transition")
      .as[(String, String, Long, Double)].collect()
    assert(trans.toSet === Set(
      ("view", "click", 333333L, 1.0),
      ("click", "purchase", 333333L, 1.0),
      ("purchase", "view", 333333L, 1.0)))
    // funnel: the hot user partial-aggregates to one row per stage
    val fun = EventAnalytics.funnelFrom(events)
      .select("stage_idx", "n_users", "frac_of_first")
      .as[(Long, Long, Double)].collect()
    assert(fun.toSeq === Seq((1L, 1L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)))
  }
}
