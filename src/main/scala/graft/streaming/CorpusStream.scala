package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-content-hash dedup state for [[CorpusStream.firstSeenDedup]]. */
case class DedupKeyState(firstId: Long, n: Long)

/** One verdict per incoming document. */
case class DedupVerdict(doc_id: Long, text_hash: String, first_id: Long,
  dup_rank: Long, keep: Boolean)

/** Streaming operators over a continuous DOCUMENT stream — the crawl-
  * ingest side of the LLM-data pipeline, where dedup decisions must be
  * made as documents arrive instead of in a nightly batch.
  */
object CorpusStream {

  /** First-seen-wins EXACT DEDUP over a continuous document stream —
    * the streaming twin of x1's batch dedup: every arriving document
    * gets a verdict (its content hash, the first doc_id that carried
    * this content, its occurrence rank, and `keep` = is it the first) —
    * the decision a crawl-ingest pipeline needs ONLINE, not at the next
    * nightly batch.
    *
    * State: one tiny (firstId, count) entry per content hash, keyed by
    * `md5(coalesce(text, ''))`, maintained by `flatMapGroupsWithState`
    * (checkpointed, restart-safe — the spec proves a duplicate arriving
    * after a restart is still recognized). State is BOUNDED by an
    * event-time TTL: each key re-arms a timeout at (its latest event
    * time + `ttlMs`), and once the watermark passes it the entry is
    * dropped — a hash unseen for the TTL window forgets, which is the
    * standard memory/recall trade of every streaming dedup (Spark's own
    * `dropDuplicatesWithinWatermark` makes the same one; this operator
    * additionally reports WHO the original was and the duplicate's
    * rank, which the built-in cannot).
    *
    * Within a micro-batch, rows are ranked by doc_id (deterministic
    * regardless of arrival interleaving). In BATCH mode the same code
    * runs with empty initial state and no timeouts — the whole input is
    * one group invocation, making the operator oracle-checkable as
    * `x57_stream_dedup` (row_number over a hash partition in ANSI SQL)
    * while the streaming spec drives the stateful/TTL path.
    *
    * 100 TB note: state size is #distinct-hashes-in-TTL-window × ~50 B,
    * hash-partitioned across executors by the groupByKey exchange — the
    * same sharding a dedicated dedup-cache service would use; the TTL
    * is what keeps an unbounded crawl from unbounded state. */
  def firstSeenDedup(spark: SparkSession, docs: DataFrame,
      watermarkDelay: String = "10 seconds",
      ttlMs: Long = 3600L * 1000,
      armTtl: Boolean = true): Dataset[DedupVerdict] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("ts").cast("timestamp"),
        md5(coalesce(col("text"), lit(""))).as("text_hash"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[DedupKeyState, DedupVerdict](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (hash, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed lastEvent + TTL with no new arrivals:
            // the hash forgets (bounded state)
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._1, r._2.getTime))
            val prev = state.getOption
            val first = prev.map(_.firstId).getOrElse(sorted.head._1)
            var n = prev.map(_.n).getOrElse(0L)
            val out = sorted.map { case (id, _, h) =>
              n += 1
              DedupVerdict(id, h, first, n, keep = n == 1L)
            }
            state.update(DedupKeyState(first, n))
            // re-arm on every arrival: TTL counts from the LATEST sight.
            // `armTtl = false` is the BATCH flavor — batch plans eliminate
            // the watermark node (EliminateEventTimeWatermark), so arming
            // an event-time timeout there would throw; batch needs no TTL
            // anyway (all state dies with the single batch).
            if (armTtl) {
              val maxEvent = sorted.map(_._2.getTime).max
              state.setTimeoutTimestamp(maxEvent + ttlMs)
            }
            out.iterator
          }
      }
  }
}
