package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.NatsLikeStream

/** The DSv2 replay source (S1): schema, admission control (B2), offset
  * checkpointing (K2/at-least-once), malformed-row tolerance (P1). */
class ReplaySourceSpec extends SparkSpec {

  private def writeBacklog(dir: String, lines: Seq[String]): Unit =
    Files.writeString(Paths.get(dir, "part-000.jsonl"), lines.mkString("\n") + "\n")

  private def line(i: Int): String = {
    val subj = if (i % 3 == 0) s"globex.crmabc.u$i" else s"globex.supprt.u$i.chat${i % 5}"
    val sec = f"${i % 60}%02d"
    s"""{"subject":"$subj","data":"{\\"text\\":\\"ev-$i\\",\\"id\\":\\"m$i\\"}","metaTimestamp":"2024-01-15T10:00:$sec+00:00","streamSeq":$i}"""
  }

  private def readReplay(dir: String, maxRows: Int) =
    spark.readStream
      .format("graft.sources.ReplayStreamProvider")
      .option("path", dir)
      .option("maxRowsPerTrigger", maxRows)
      .load()

  test("replays the backlog with the envelope schema and admission cap") {
    val dir = Files.createTempDirectory("graft_replay").toString
    writeBacklog(dir, (0 until 25).map(line))
    val out = Files.createTempDirectory("graft_replay_out").toString
    val cp = Files.createTempDirectory("graft_replay_cp2").toString
    val q = readReplay(dir, maxRows = 10)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq === Seq("subject", "data", "metaTimestamp", "streamSeq"))
    assert(got.count() === 25)
    // 25 rows at maxRows=10 → 3 micro-batches (B2 count flush)
    assert(Files.list(Paths.get(s"$cp/offsets")).count() >= 3)
    // restart with the same checkpoint: nothing new → no duplicate rows (K2)
    val q2 = readReplay(dir, maxRows = 10)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() === 25)
  }

  test("malformed lines are skipped (P1 row-level tolerance)") {
    val dir = Files.createTempDirectory("graft_replay_bad").toString
    writeBacklog(dir, (0 until 5).map(line) ++ Seq("NOT JSON", "{\"x\":1}") ++ (5 until 10).map(line))
    val out = Files.createTempDirectory("graft_replay_bad_out").toString
    val cp = Files.createTempDirectory("graft_replay_bad_cp").toString
    val q = readReplay(dir, maxRows = 100)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // {"x":1} has no metaTimestamp → dropped; "NOT JSON" → dropped
    assert(spark.read.parquet(out).count() === 10)
  }

  test("feeds the full reference pipeline end to end") {
    val dir = Files.createTempDirectory("graft_replay_pipe").toString
    writeBacklog(dir, (0 until 30).map(line))
    val wh = Files.createTempDirectory("graft_replay_pipe_wh").toString
    val cp = Files.createTempDirectory("graft_replay_pipe_cp").toString
    val q = NatsLikeStream.start(readReplay(dir, 1000), wh, cp, Trigger.AvailableNow())
    q.awaitTermination()
    // 10 of 30 are crmabc → filtered by the subject pattern (S2)
    assert(spark.read.parquet(s"$wh/raw").count() === 20)
    assert(spark.read.parquet(s"$wh/analytics").count() === 20)
  }
}
