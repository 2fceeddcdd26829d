package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One closed (or, in batch mode, final) session. Schema matches the
  * batch sessionization query (q14) so the same DuckDB oracle gates
  * both. */
case class SessionRow(user_id: Long, session_seq: Long, n_events: Long,
  session_start: Timestamp, session_end: Timestamp, sum_value: Double)

/** Per-user open-session state for [[SessionStream.sessionize]].
  * `sum_scaled` accumulates value·10⁶ after HALF_UP rounding at 6 dp —
  * the exact-long mirror of the battery's DECIMAL(25,6) accumulator, so
  * the emitted double is bit-identical to `dsum` regardless of arrival
  * interleaving. */
case class OpenSession(seq: Long, start: Timestamp, last: Timestamp,
  n: Long, sum_scaled: Long)

/** Streaming operators over the `events` changelog. */
object SessionStream {

  /** Inactivity gap that closes a session (same 1800 s as q14). */
  val GapSeconds = 1800L

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** Second-truncated epoch — q14's `date_trunc('second', ts)` gap rule. */
  private def secs(t: Timestamp): Long = t.toInstant.getEpochSecond

  /** value → exact scaled long via the DECIMAL(25,6) rounding rule
    * (HALF_UP at 6 dp over the double's shortest decimal form — the
    * same path Spark's `cast(v as decimal(25,6))` takes). */
  private def scale6(v: Double): Long =
    (BigDecimal(v) * BigDecimal(1000000))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** x72: streaming gap-based sessionization — the q14 batch query as
    * an ONLINE operator. Every user's open session lives as one tiny
    * state row; a session is emitted when a ≥[[GapSeconds]] gap arrives
    * in-stream, or (streaming only) when the event-time watermark
    * passes `last_event + gap` and the timeout fires — the standard
    * session-window close. State is one row per ACTIVE user (bounded by
    * the gap window, not history), hash-partitioned by the groupByKey
    * exchange exactly as a session store would shard.
    *
    * In BATCH mode (`armTimeout = false`) the same code runs with one
    * group invocation per user and no timeouts, emitting every session
    * including the trailing one — semantically identical to the q14
    * window formulation, and gated by the SAME DuckDB oracle
    * (`x72_stream_sessions`). The streaming path (timeout close,
    * cross-batch session continuation, restart recovery from the
    * checkpoint) is spec-driven (`StreamingSpec`).
    *
    * Ordering: within an invocation rows sort by (event-time micros,
    * event_id) — deterministic under any arrival interleaving; the
    * per-session sum accumulates in exact scaled longs so the emitted
    * double matches `dsum` bit-for-bit. Cross-batch disorder beyond the
    * watermark delay is the usual streaming approximation (late rows
    * fold into whatever session is open). */
  def sessionize(spark: SparkSession, events: DataFrame,
      watermarkDelay: String = "10 seconds",
      armTimeout: Boolean = true): Dataset[SessionRow] = {
    import spark.implicits._
    def emit(user: Long, s: OpenSession): SessionRow =
      SessionRow(user, s.seq, s.n, s.start, s.last,
        s.sum_scaled.toDouble / 1000000.0)
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"), col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(user, s))
          } else {
            val sorted = rows.toSeq.sortBy(r => (micros(r._3), r._2))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var open = state.getOption
            sorted.foreach { case (_, _, t, v) =>
              open = open match {
                case Some(s) if secs(t) - secs(s.last) <= GapSeconds =>
                  Some(s.copy(
                    last = if (micros(t) > micros(s.last)) t else s.last,
                    n = s.n + 1, sum_scaled = s.sum_scaled + scale6(v)))
                case Some(s) =>
                  out += emit(user, s)
                  Some(OpenSession(s.seq + 1, t, t, 1L, scale6(v)))
                case None =>
                  Some(OpenSession(1L, t, t, 1L, scale6(v)))
              }
            }
            if (armTimeout) {
              open.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(
                  s.last.getTime + GapSeconds * 1000L)
              }
            } else {
              // batch mode: everything is final — emit the trailing
              // session too and keep no state
              out ++= open.map(emit(user, _))
              if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }
}
