package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._

/** Envelope → raw-table rows: the per-message transform pipeline of the
  * reference service (`main.go:153-212`), expressed as one narrow `select`
  * (no shuffle — P1–P4 of SURVEY.md §2.3 are all scalar).
  *
  * Input schema: [[graft.model.Schemas.envelope]]
  * Output schema: [[graft.model.Schemas.raw]]
  */
object Ingest {

  /** P1 metadata extraction + P2 JSON serialize + P3 subject split +
    * P4 projection, as the reference does per message at `main.go:162-196`.
    *
    * The metadata JSON mirrors what `json.Marshal(msg.Metadata())` produces
    * (`main.go:168-172`): JetStream sequence/timestamp fields. Built with
    * `to_json(struct(...))` so it stays codegen'd; `coalesce(…, '{}')`
    * reproduces the marshal-error fallback at `main.go:170-171`. */
  def envelopeToRaw(envelopes: DataFrame): DataFrame =
    envelopes.select(
      toSecond(col("metaTimestamp")).as("timestamp"),
      col("subject"),
      chatId(col("subject")).as("chat_id"),
      col("streamSeq").as("sequence"),
      coalesce(
        to_json(struct(
          struct(
            col("streamSeq").as("Consumer"),
            col("streamSeq").as("Stream")
          ).as("Sequence"),
          lit(1L).as("NumDelivered"),
          lit(0L).as("NumPending"),
          date_format(col("metaTimestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .as("Timestamp")
        )),
        lit("{}")
      ).as("metadata"),
      col("data")
    )

  /** S2: subject wildcard filter — only `<prefix>.>` subjects are delivered
    * (reference `main.go:88`, patterns `nats.yml:8-10`). In a live NATS
    * source this is server-side; semantically it is a prefix filter. */
  def subjectFilter(df: DataFrame, prefix: String): DataFrame =
    df.filter(col("subject").startsWith(prefix + "."))
}
