package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions.dsum
import graft.queries.Tables

/** Temporal join operators Spark lacks as primitives, composed from
  * built-ins in their scalable shapes (SURVEY §2.6 / builder guidance
  * "compose existing ops if semantics allow"):
  *
  *  - as-of (point-in-time) join: union both sides, one shuffle on the
  *    key, a running `last(_, ignoreNulls)` window carries the most
  *    recent left-side attributes forward — O(n log n) per key, no
  *    range-join explosion;
  *  - range join: bucket the time axis, replicate the probe side into
  *    the two candidate buckets, equi-join on (key, bucket), then apply
  *    the exact range predicate — the shuffle key is (key, bucket), so
  *    a 100 TB range join never degenerates into a nested-loop join.
  */
object TemporalJoins {

  /** For each `click` event: the user's most recent `view` at or before
    * the click (the classic point-in-time correctness join of feature
    * pipelines). View side is pre-aggregated per (user, ts) so the match
    * is unique and deterministic; misses surface as epoch-0/-1/0.0. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("view_event_id"),
        dsum(col("value")).as("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts", "value")
    val vTagged = views.select(
      col("user_id"), col("ts"), lit(0).as("side"),
      col("view_event_id"), col("view_value"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("double").as("value"))
    val cTagged = clicks.select(
      col("user_id"), col("ts"), lit(1).as("side"),
      lit(null).cast("long").as("view_event_id"),
      lit(null).cast("double").as("view_value"),
      col("event_id"), col("value"))
    // At equal ts the view row (side=0) sorts first → `<=` semantics,
    // matching DuckDB ASOF's `c.ts >= v.ts`.
    val w = Window.partitionBy("user_id").orderBy("ts", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vTagged.unionByName(cTagged)
      .withColumn("last_view_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .withColumn("last_view_id",
        last(col("view_event_id"), ignoreNulls = true).over(w))
      .withColumn("last_view_value",
        last(col("view_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("user_id"), col("event_id"), col("ts"), col("value"),
        coalesce(col("last_view_ts"), timestamp_seconds(lit(0)))
          .as("asof_view_ts"),
        coalesce(col("last_view_id"), lit(-1L)).as("asof_view_id"),
        coalesce(col("last_view_value"), lit(0.0)).as("asof_view_value"))
      .orderBy("user_id", "event_id")
  }

  /** Per click: how many views (and their value sum) the same user had in
    * the preceding hour `(ts-1h, ts]`. Bucketed so the join is an
    * equi-join on (user, hour-bucket): each click probes its own bucket
    * and the previous one; the exact range predicate filters after. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("vus"),
        col("value").as("view_value"))
      .withColumn("bucket", col("vus") / lit(3600000000L))
      .withColumn("bucket", col("bucket").cast("long"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("cus"))
      .withColumn("b0", (col("cus") / lit(3600000000L)).cast("long"))
    // replicate each click into its bucket and the previous one
    val probes = clicks.withColumn("bucket",
        explode(array(col("b0") - 1, col("b0"))))
    probes.join(views, Seq("user_id", "bucket"), "left")
      .withColumn("in_range",
        col("vus").isNotNull &&
        col("vus") > col("cus") - lit(3600000000L) &&
        col("vus") <= col("cus"))
      .groupBy("user_id", "event_id", "ts")
      .agg(
        sum(when(col("in_range"), 1L).otherwise(0L)).as("n_views_1h"),
        dsum(when(col("in_range"), col("view_value")).otherwise(lit(0.0)))
          .as("sum_view_value_1h"))
      .orderBy("user_id", "event_id")
  }
}
