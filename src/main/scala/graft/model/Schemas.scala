package graft.model

import org.apache.spark.sql.types._

/** Fixed schemas of the reference pipeline, re-expressed as Spark StructTypes.
  *
  * Raw table: reference `clickhouse-config/init/init.sql:8-19` (identical at
  * :21-32, :35-46). Analytics table: `init.sql:74-96`. Envelope: the NATS
  * JetStream delivery shape consumed at `main.go:90-94` / `main.go:162`.
  *
  * Type mapping notes (SURVEY.md §1.2):
  *  - ClickHouse `DateTime` is second-precision → TimestampType + an explicit
  *    `date_trunc("second", …)` at the ingest boundary.
  *  - `UInt64` → LongType (JetStream sequences stay far below 2^63).
  *  - `JSON` / JSON-text payloads stay StringType until extraction
  *    (schema-on-read, matching `main.go:191`).
  */
object Schemas {

  /** One NATS JetStream delivery: subject + opaque payload + stream metadata. */
  val envelope: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("data", StringType, nullable = true),
    StructField("metaTimestamp", TimestampType, nullable = false),
    StructField("streamSeq", LongType, nullable = false)
  ))

  /** Raw MergeTree table shape (`init.sql:8-19`): 6 fixed columns. */
  val raw: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("chat_id", StringType, nullable = false),
    StructField("sequence", LongType, nullable = false),
    StructField("metadata", StringType, nullable = false),
    StructField("data", StringType, nullable = true)
  ))

  /** Analytics table shape (`init.sql:74-96`): 5 pass-through + 12 derived. */
  val analytics: StructType = StructType(
    Seq(
      StructField("timestamp", TimestampType, nullable = false),
      StructField("subject", StringType, nullable = false),
      StructField("chat_id", StringType, nullable = false),
      StructField("metadata", StringType, nullable = false),
      StructField("data", StringType, nullable = true)
    ) ++ Seq(
      "message_text", "message_meta", "message_id"
    ).map(StructField(_, StringType, nullable = false)) ++ Seq(
      StructField("message_timestamp", TimestampType, nullable = false)
    ) ++ Seq(
      "client_code", "project_code", "user_id", "session_id",
      "message_from", "message_to", "message_type", "message_context"
    ).map(StructField(_, StringType, nullable = false))
  )

  /** Derived-column names of the analytics MV (`init.sql:109-120`), in order. */
  val analyticsDerived: Seq[String] = analytics.fieldNames.drop(5).toSeq
}
