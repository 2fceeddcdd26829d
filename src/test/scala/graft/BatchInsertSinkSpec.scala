package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The DSv2 batch-insert sink (K1/K2): blocks visible only after epoch
  * commit, restart does not duplicate, schema-driven serialization. */
class BatchInsertSinkSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def envs(from: Long, n: Int): Seq[Env] =
    (from until from + n).map { i =>
      Env(s"globex.supprt.u$i", s"""{"text":"ev-$i"}""",
        ts("2024-01-15 10:00:00"), i)
    }

  private def tableFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq
      .map(_.getFileName.toString).filter(_.endsWith(".jsonl")).sorted

  private def readBack(dir: String) =
    spark.read.schema(StructType(Seq(
      StructField("subject", StringType),
      StructField("data", StringType),
      StructField("metaTimestamp", LongType),
      StructField("streamSeq", LongType))))
      .json(s"$dir/*.jsonl")

  test("epoch commit publishes blocks; counts and values round-trip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink").toString
    val cp = Files.createTempDirectory("graft_sink_cp").toString
    val src = MemoryStream[Env]
    src.addData(envs(0, 25): _*)
    val q = src.toDF().writeStream
      .format("graft.sinks.BatchInsertSinkProvider")
      .option("path", dir).option("batchSize", 10)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(tableFiles(dir).nonEmpty)
    val got = readBack(dir)
    assert(got.count() === 25)
    assert(got.where("subject = 'globex.supprt.u7'").count() === 1)
    // timestamps serialized as epoch micros
    assert(got.selectExpr("min(metaTimestamp)").head.getLong(0) ===
      ts("2024-01-15 10:00:00").getTime * 1000L)
    // restart on the same checkpoint with no new data → no duplicates (K2)
    val q2 = src.toDF().writeStream
      .format("graft.sinks.BatchInsertSinkProvider")
      .option("path", dir).option("batchSize", 10)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(readBack(dir).count() === 25)
  }

  test("source → pipeline → sink: the full connector chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink_chain").toString
    val cp = Files.createTempDirectory("graft_sink_chain_cp").toString
    val src = MemoryStream[Env]
    src.addData(envs(0, 12): _*)
    val raw = graft.pipeline.Ingest.envelopeToRaw(src.toDF())
    val q = raw.writeStream
      .format("graft.sinks.BatchInsertSinkProvider")
      .option("path", dir).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.json(s"$dir/*.jsonl")
    assert(got.count() === 12)
    assert(got.columns.sorted.toSeq ===
      Seq("chat_id", "data", "metadata", "sequence", "subject", "timestamp"))
  }
}
