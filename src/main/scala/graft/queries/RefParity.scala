package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._
import graft.pipeline.{Ingest, Views}

/** Reference-parity queries, driven by the `events` table (the corpus
  * stand-in for the NATS message stream — see FIXTURES.md §B).
  *
  * Each query here has a DuckDB oracle in [[graft.SparkEntry.oracleSql]];
  * the envelope synthesis below is therefore written so the *same*
  * expressions exist in ANSI SQL (concat/case/%), making the Spark and
  * oracle results comparable value-for-value.
  */
object RefParity {

  /** Deterministic NATS-like envelope over `events`:
    * `subject` patterned after the reference's
    * `client.project.user.session.from.to.type.context` 8-segment scheme
    * (`nats.yml:8-10`, `init.sql:113-120`), with deliberate short subjects
    * to exercise the out-of-range `''` semantics; `data` alternates between
    * a full JSON payload and the raw `props` (which lacks the extraction
    * keys → all ClickHouse defaults). */
  def envelopes(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val stream = when(col("event_type").isin("view", "click"), lit("supprt"))
      .otherwise(lit("crmabc"))
    val base = concat(
      lit("globex."), stream, lit(".u"), col("user_id").cast("string"))
    val session = concat(lit(".chat"), (col("event_id") % 97).cast("string"))
    val tail = concat(
      lit(".bot.user."), col("event_type"),
      lit(".ctx"), (col("event_id") % 5).cast("string"))
    val subject = when(col("event_id") % 10 === 0, base)
      .when(col("event_id") % 10 === 1, concat(base, session))
      .otherwise(concat(base, session, tail))
    val fullPayload = concat(
      lit("{\"text\":\"ev-"), col("event_id").cast("string"),
      lit("\",\"meta\":\""), col("event_type"),
      lit("\",\"id\":\"m"), col("event_id").cast("string"),
      lit("\",\"timestamp\":"),
      unix_timestamp(date_trunc("second", col("ts"))).cast("string"),
      lit("}"))
    val data = when(col("event_id") % 7 === 0, col("props"))
      .otherwise(fullPayload)
    ev.select(
      subject.as("subject"),
      data.as("data"),
      col("ts").as("metaTimestamp"),
      col("event_id").as("streamSeq"))
  }

  /** R1: the ingest hot path (P1–P4) — envelope → raw-table rows. */
  def ingestRaw(spark: SparkSession, sfDir: String): DataFrame =
    Ingest.envelopeToRaw(envelopes(spark, sfDir))
      .orderBy("sequence")

  /** R2 (Q7): `splitByChar('.', subject)[n]` for n = 1..8 with the
    * ClickHouse out-of-range `''` default, plus the Go-side 0-indexed
    * `parts[3]` chat_id — asserting the §2.5 indexing quirk on real data. */
  def subjectSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val env = envelopes(spark, sfDir)
    env.select(
      Seq(col("streamSeq").as("sequence"), col("subject"),
        chatId(col("subject")).as("chat_id_go")) ++
      (1 to 8).map(n => subjectSegment(col("subject"), n).as(s"seg$n")): _*
    ).orderBy("sequence")
  }

  /** R3 (Q5+Q6): JSON extraction with ClickHouse defaults — present keys,
    * missing keys (→ `''`), numeric-as-string, and `JSONExtractUInt` epoch
    * timestamps (missing → 0 → 1970-01-01). */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val env = envelopes(spark, sfDir)
    // one json_tuple parse for all five keys (see Views.deriveAnalytics)
    env
      .select(col("streamSeq").as("sequence"),
        json_tuple(col("data"), "text", "meta", "missing", "k", "timestamp")
          .as(Seq("_jx_text", "_jx_meta", "_jx_missing", "_jx_k", "_jx_ts")))
      .select(
        col("sequence"),
        chString(col("_jx_text")).as("x_text"),
        chString(col("_jx_meta")).as("x_meta"),
        chString(col("_jx_missing")).as("x_missing"),
        chUInt(col("_jx_k")).as("x_k"),
        chEpochTimestamp(col("_jx_ts")).as("x_ts")
      ).orderBy("sequence")
  }

  /** R4 (Q4): the full 17-column analytics MV derivation over the
    * synthesized stream — the reference's flagship continuous query. */
  def analyticsDerive(spark: SparkSession, sfDir: String): DataFrame =
    Views.deriveAnalytics(ingestRaw(spark, sfDir))
      .orderBy("metadata")

  /** R10: the analytics derivation with the SEMI-STRUCTURED columns
    * mapped faithfully. The reference's analytics table declares
    * `metadata JSON, data JSON` (`clickhouse-config/init/init.sql:79-80`);
    * Spark 4.1's VariantType is that type's engine-native mapping, where
    * [[analyticsDerive]] (SURVEY §1.2) uses the StringType +
    * `get_json_object` fallback. Each JSON string parses ONCE into a
    * binary variant (`try_parse_json` — parse failure degrades to null,
    * matching ClickHouse's unparseable-JSON behavior, not a query
    * error); every extraction then reads the variant, including a
    * NESTED path into the JetStream metadata envelope — the
    * single-parse / many-extract contract a JSON column type exists
    * for, and the faithful scale story (the string fallback re-parses
    * per extraction; the variant is parsed once per row regardless of
    * how many fields the query reads).
    *
    * Output exposes extracted primitives (not raw variant bytes) so the
    * DuckDB oracle compares value-for-value. */
  def analyticsVariant(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = ingestRaw(spark, sfDir)
    val v = raw.select(
      col("sequence"),
      try_parse_json(col("metadata")).as("meta_v"),
      try_parse_json(col("data")).as("data_v"))
    v.select(
      col("sequence"),
      chString(try_variant_get(col("data_v"), "$.text", "string"))
        .as("message_text"),
      chString(try_variant_get(col("data_v"), "$.meta", "string"))
        .as("message_meta"),
      chString(try_variant_get(col("data_v"), "$.id", "string"))
        .as("message_id"),
      chEpochTimestamp(try_variant_get(col("data_v"), "$.timestamp", "string"))
        .as("message_timestamp"),
      chUInt(try_variant_get(col("data_v"), "$.k", "string")).as("x_k"),
      try_variant_get(col("meta_v"), "$.Sequence.Stream", "bigint")
        .as("meta_stream_seq"),
      chString(try_variant_get(col("meta_v"), "$.Timestamp", "string"))
        .as("meta_ts_str")
    ).orderBy("sequence")
  }

  /** R5 (Q2+Q3): the two per-stream MVs union into one table. Spark side
    * filters the raw stream into the two subject prefixes and unions back
    * (streaming-compatible unionByName), then aggregates per stream. */
  def unionStreams(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Ingest.envelopeToRaw(envelopes(spark, sfDir))
    val supprt = Ingest.subjectFilter(raw, "globex.supprt")
    val crmabc = Ingest.subjectFilter(raw, "globex.crmabc")
    Views.allStreams(Seq(supprt, crmabc))
      .groupBy(subjectSegment(col("subject"), 2).as("stream"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("sequence")).as("min_seq"),
        max(col("sequence")).as("max_seq"),
        count(when(col("chat_id") =!= "", 1)).as("n_with_chat"))
      .orderBy("stream")
  }

  /** R6 (Q1): `toYYYYMM` month partitioning — the partition-pruning axis of
    * every reference table. Counts per month prove the layout function. */
  def monthPartitions(spark: SparkSession, sfDir: String): DataFrame =
    Views.withMonth(ingestRaw(spark, sfDir))
      .groupBy("month")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("timestamp")).as("min_ts"),
        max(col("timestamp")).as("max_ts"))
      .orderBy("month")
}
