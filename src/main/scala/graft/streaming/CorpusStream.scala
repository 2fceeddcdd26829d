package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, GraftSql, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions.{minhashSig, shingles}
import graft.util.OperatorCaches

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

  /** x104: STREAMING NEAR-DUP AGAINST A STATIC BASE INDEX — the online
    * flavor of x103's daily-batch shape, and the decision a crawl-ingest
    * pipeline wants at ARRIVAL time: is this incoming document a
    * near-copy of anything already in the corpus? Every streamed doc
    * gets one verdict row (match count from the x2 verify floor, best
    * base partner, the τ = [[graft.operators.Dedup.DeltaDupTau]] drop
    * decision) — including no-candidate and empty/null-text docs, which
    * ride a `posexplode_outer` null band through the left join instead
    * of silently vanishing.
    *
    * Composition (all stream-STATIC — no stream-stream state):
    * per-row MinHash band keys + 60-bit probe fingerprints (narrow
    * projections, computed once per doc BEFORE the band explode) →
    * left equi-join against the base band index (bucket cap on BASE
    * membership, x103's discipline) → `dropDuplicatesWithinWatermark`
    * on (doc, base) (a pair surfaces once however many bands agree) →
    * one fingerprint verify per surviving PAIR → one watermarked
    * per-doc windowed aggregate. In BATCH mode the same
    * composition runs with plain `dropDuplicates` and the watermark
    * eliminated — [[deltaDedupBatch]] is the oracle-checkable carrier
    * (`x104_stream_delta_dedup`, same oracle SQL as x103).
    *
    * 100 TB note: the static side is built once per query start and
    * persisted (a deployment materializes it as a bucketed table and
    * hot-swaps on corpus compaction); per-micro-batch cost is
    * ∝ batch·bands probe rows, and the only streaming state is the
    * dedup + open-window buffers, both bounded by the watermark. */
  def deltaDedupStream(spark: SparkSession, streamDocs: DataFrame,
      baseDocs: DataFrame,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    import graft.operators.Dedup
    def bandLong(hs: Column) =
      conv(substring(hs, 1, 15), 16, 10).cast("long")
    def fpOf(arr: Column): Column = transform(arr,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    val baseSh = Dedup.shingleTableFrom(
      baseDocs.select(col("doc_id"), col("text")))
    val baseBands = OperatorCaches.persist(
      baseSh.select(col("doc_id").as("base_id"),
          posexplode(minhashSig(col("sh"), Dedup.NumMinhashes)))
        .toDF("base_id", "band", "hs")
        .select(col("base_id"), col("band"), bandLong(col("hs")).as("h")))
    val keptBuckets = baseBands.groupBy("band", "h")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= Dedup.MaxBandBucket)
      .select("band", "h")
    val baseFps = baseSh.select(col("doc_id").as("base_id"),
      fpOf(col("sh")).as("fp_b"), size(col("sh")).cast("long").as("nb"))
    // The static index is ONE inverted-fingerprint-index row per kept
    // bucket ([[graft.expressions.BuildBucketIndex]] — x103's round-12
    // shape): each probe verifies against the bucket row inside the
    // stream-static join's map stage
    // ([[graft.expressions.ProbeBucketIndex]]), so no candidate-level
    // fingerprint arrays ever reach the dedup state store or an
    // exchange — the round-11 sf10 gate's 35.5×/decade x104 row was
    // exactly that: ~4 KB probe arrays riding one state-store row per
    // (doc, base) CANDIDATE. The pair dedup now runs on τ-SURVIVORS
    // (plus the null no-candidate row), whose values are identical in
    // every agreeing band — same final match set, tiny state.
    val index = OperatorCaches.persist(
      baseBands.join(keptBuckets, Seq("band", "h"))
        .join(baseFps, "base_id")
        .groupBy("band", "h")
        .agg(collect_list(struct(col("base_id"), col("fp_b"), col("nb")))
          .as("ms"))
        .select(col("band"), col("h"),
          GraftSql.column(graft.expressions.BuildBucketIndex(
            GraftSql.expression(col("ms")))).as("idx")))
    // The shingle array is materialized by a Generate (explode of a
    // 1-element array) — the stream-legal stand-in for the batch side's
    // persist barrier: without it, project-collapse inlines the
    // interpreted shingle builder into every consumer (fp, sig, size).
    val probes = streamDocs
      .select(col("doc_id"), col("ts").cast("timestamp"),
        explode(array(shingles(coalesce(col("text"), lit("")))))
          .as("sh"))
      .withWatermark("ts", watermarkDelay)
    // Probe fingerprints are computed ONCE per doc BEFORE the band
    // explode and ride the exchanges as 60-bit longs (the x2 sf10
    // lesson) — never the shingle strings, and never per candidate row:
    // the first x104 sf10 spot-run shipped the string arrays through
    // the band join and re-md5'd them per band-hit, measuring 15.2×
    // per decade; this shape measures linear again.
    val banded = probes
      .select(col("doc_id"), col("ts"), fpOf(col("sh")).as("fp_d"),
        size(col("sh")).cast("long").as("nd"),
        posexplode_outer(
          when(size(col("sh")) > 0,
            minhashSig(col("sh"), Dedup.NumMinhashes))))
      .toDF("doc_id", "ts", "fp_d", "nd", "band", "hs")
      .select(col("doc_id"), col("ts"), col("fp_d"), col("nd"),
        col("band"), bandLong(col("hs")).as("h"))
    val cand = banded
      .join(index, Seq("band", "h"), "left_outer")
      .select(col("doc_id"), col("ts"),
        explode_outer(GraftSql.column(graft.expressions.ProbeBucketIndex(
          GraftSql.expression(col("fp_d")), GraftSql.expression(col("nd")),
          GraftSql.expression(col("idx")), 0.02))).as("mt"))
      .select(col("doc_id"), col("ts"), col("mt.base_id").as("base_id"),
        col("mt.jaccard").as("jaccard"))
    // pair-dedupe the SURVIVORS: a pair surfaces once however many
    // bands agree (identical verify values each time), and the
    // no-candidate null rows collapse to one verdict row per doc
    val pairs =
      if (cand.isStreaming)
        cand.dropDuplicatesWithinWatermark(Seq("doc_id", "base_id"))
      else cand.dropDuplicates(Seq("doc_id", "base_id"))
    pairs
      .select(col("doc_id"), col("ts"), col("base_id"), col("jaccard"))
      .groupBy(window(col("ts"), "1 second"), col("doc_id"))
      .agg(
        sum(when(col("jaccard") >= 0.02, 1L).otherwise(0L))
          .as("n_matches"),
        max(when(col("jaccard") >= 0.02,
          struct(col("jaccard").as("j"), (-col("base_id")).as("nid"))))
          .as("best"))
      .select(col("doc_id"), col("n_matches"),
        (-col("best.nid")).as("best_base"),
        col("best.j").as("best_jaccard"),
        coalesce(col("best.j") >= Dedup.DeltaDupTau, lit(false))
          .as("is_dup"))
  }

  /** [[deltaDedupStream]] over the service's NATS ENVELOPE stream — the
    * `graft.Service --delta <base>` adapter, mirroring
    * [[SessionStream.sessionizeEnvelopes]]: the payload carries the
    * document (`$.doc_id` / `$.text`), `metaTimestamp` is the event
    * time, and envelopes without a payload doc_id fall back to the
    * JetStream sequence (so EVERY envelope — including null/absent-text
    * ones — still receives a verdict row, the operator's contract). */
  def deltaDedupEnvelopes(spark: SparkSession, envelopes: DataFrame,
      baseDocs: DataFrame,
      watermarkDelay: String = "10 seconds"): DataFrame =
    deltaDedupStream(spark,
      envelopes.select(
        coalesce(get_json_object(col("data"), "$.doc_id").cast("long"),
          col("streamSeq").cast("long")).as("doc_id"),
        col("metaTimestamp").cast("timestamp").as("ts"),
        get_json_object(col("data"), "$.text").as("text")),
      baseDocs, watermarkDelay)

  /** [[deltaDedupStream]]'s batch carrier over the documents table:
    * the same in-plan 80th-percentile id-space split as
    * [[graft.operators.Dedup.deltaDedup]] (base below, delta at/above,
    * event time = doc_id seconds), so the TWO implementations — the
    * batch pipeline and the streaming composition — are checked against
    * the SAME oracle SQL, and against each other in the spec. */
  def deltaDedupBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.queries.Tables.documentsParallel(spark, sfDir)
    val split = docs.agg(
      floor(max(col("doc_id")).cast("double") * 4.0 / 5.0)
        .cast("long").as("split_id"))
    val base = docs.crossJoin(broadcast(split))
      .filter(col("doc_id") < col("split_id"))
      .select("doc_id", "text")
    val delta = docs.crossJoin(broadcast(split))
      .filter(col("doc_id") >= col("split_id"))
      .select(col("doc_id"),
        timestamp_seconds(col("doc_id")).as("ts"), col("text"))
    deltaDedupStream(spark, delta, base).orderBy("doc_id")
  }
}
