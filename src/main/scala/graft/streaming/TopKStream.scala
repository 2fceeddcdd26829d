package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted per-window ranking row. Schema matches the exact
  * per-window top-k SQL so the same DuckDB oracle gates the batch
  * flavor. */
case class WindowTopK(window_start: Timestamp, rank: Long,
  event_type: String, n_events: Long)

/** Per-window Misra–Gries summary for [[TopKStream.windowTopK]]:
  * parallel key/count arrays (≤ [[TopKStream.MgK]] entries — a few KB
  * per OPEN window, the whole point of sketched streaming top-k). */
case class MgSummary(types: Array[String], counts: Array[Long])

/** Streaming top-k operators over the `events` changelog. */
object TopKStream {

  /** Misra–Gries summary size. Counters are EXACT (not lower bounds)
    * whenever a window's distinct key cardinality is ≤ [[MgK]] — the
    * x65 argument: no decrement ever fires, so the summary degenerates
    * to a plain exact count map. The events corpus has a handful of
    * event types, so the oracle-gated batch flavor is exact by
    * construction; a deployment with adversarial cardinality gets the
    * standard MG guarantee (count ≥ true − N/k) instead. */
  val MgK = 64

  /** Ranks emitted per closed window. */
  val TopK = 8

  /** Tumbling window width (seconds). */
  val WindowSeconds = 3600L

  /** x85: STREAMING WINDOWED HEAVY HITTERS — per-hour top-[[TopK]]
    * event types, maintained ONLINE: each open window's type counts
    * live as one bounded Misra–Gries summary (O([[MgK]]) state per
    * window, NOT O(distinct types)), folded row-at-a-time as
    * micro-batches arrive and emitted ONCE when the event-time
    * watermark passes the window end — the leaderboard-per-window
    * pattern (trending topics, hot keys) that a windowed
    * groupBy+rank cannot produce incrementally with bounded state.
    *
    * In BATCH mode (`armTimeout = false`) the same fold runs with one
    * group invocation per window and emits immediately — O([[MgK]])
    * memory per invocation regardless of window size (MG never buffers
    * rows), gated by the exact per-window top-k DuckDB oracle
    * (`x85_window_topk`; exactness argument at [[MgK]]). Parallelism in
    * batch mode is bounded by the number of windows — fine for a
    * changelog's hours; an unwindowed global top-k should use x65's
    * two-phase Misra–Gries instead. The streaming path (cross-batch
    * summary continuation, watermark-close, checkpoint restart) is
    * spec-driven (`StreamingSpec`).
    *
    * Ties rank deterministically by (count DESC, event_type ASC),
    * mirrored in the oracle. */
  /** [[windowTopK]] over the SERVICE's envelope stream (the DSv2 replay
    * source's schema): the ranked key is the payload's `event_type`
    * when present, else the subject (a hot-subjects leaderboard for
    * plain pipeline traffic); event-time is the JetStream metadata
    * timestamp. This is the x85 path `Service --topk` runs end-to-end:
    * ReplaySource → windowTopK → per-batch appended parquet. */
  def windowTopKEnvelopes(spark: SparkSession, envelopes: DataFrame,
      watermarkDelay: String = "10 seconds"): Dataset[WindowTopK] =
    windowTopK(spark, envelopes.select(
      col("metaTimestamp").cast("timestamp").as("ts"),
      coalesce(get_json_object(col("data"), "$.event_type"),
        col("subject")).as("event_type")), watermarkDelay)

  def windowTopK(spark: SparkSession, events: DataFrame,
      watermarkDelay: String = "10 seconds",
      armTimeout: Boolean = true): Dataset[WindowTopK] = {
    import spark.implicits._
    events
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"))
      .filter(col("event_type").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(
        unix_timestamp(date_trunc("hour", col("ts"))).as("wstart"),
        col("ts"), col("event_type"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgSummary, WindowTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (wstart, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            emitTopK(wstart, s)
          } else {
            // Fold rows one at a time into the bounded summary — MG
            // never buffers the group, so a billion-event window costs
            // the same few KB as an empty one.
            var s = state.getOption.getOrElse(
              MgSummary(Array.empty, Array.empty))
            rows.foreach { case (_, _, t) => s = mgAdd(s, t) }
            if (armTimeout) {
              state.update(s)
              // close when the watermark passes the window end
              state.setTimeoutTimestamp(
                (wstart + WindowSeconds) * 1000L)
              Iterator.empty
            } else {
              // batch mode: the invocation saw the whole window
              if (state.exists) state.remove()
              emitTopK(wstart, s)
            }
          }
      }
  }

  /** One MG insertion: increment a present key, append below capacity,
    * otherwise decrement every counter (dropping zeros) — the classic
    * k-counter sketch step. Arrays copy on structural change only;
    * the common increment path mutates in place. Capacity is a
    * parameter so `GraftProperties` can drive the decrement path with
    * small streams (production path always passes [[MgK]]). */
  private[graft] def mgAdd(s: MgSummary, t: String,
      cap: Int = MgK): MgSummary = {
    val i = s.types.indexOf(t)
    if (i >= 0) { s.counts(i) += 1L; s }
    else if (s.types.length < cap)
      MgSummary(s.types :+ t, s.counts :+ 1L)
    else {
      val keep = Array.newBuilder[Int]
      var j = 0
      while (j < s.counts.length) {
        if (s.counts(j) > 1L) keep += j
        j += 1
      }
      val ks = keep.result()
      MgSummary(ks.map(s.types), ks.map(k => s.counts(k) - 1L))
    }
  }

  private def emitTopK(wstart: Long, s: MgSummary): Iterator[WindowTopK] = {
    val ts = new Timestamp(wstart * 1000L)
    s.types.indices
      .sortBy(i => (-s.counts(i), s.types(i)))
      .take(TopK)
      .zipWithIndex
      .map { case (i, r) =>
        WindowTopK(ts, r + 1L, s.types(i), s.counts(i))
      }
      .iterator
  }
}
