package graft.sinks

import java.io.{BufferedWriter, FileOutputStream, IOException, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.mutable.ArrayBuffer

import net.jpountz.lz4.LZ4BlockOutputStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DoubleType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 streaming sink (SURVEY §2.4 K1/K2): the local stand-in
  * for the reference's batched ClickHouse INSERT protocol
  * (`main.go:153-212`, clickhouse-go `PrepareBatch`/`Append`/`Send`),
  * carrying the reference connection's client settings
  * (`connection/connection.go:46-76`):
  *
  *  - K1 batched insert: each task buffers rows and flushes them as one
  *    block file (the columnar insert block analogue); `batchSize` rows
  *    per flush mirrors the reference's 1000-row blocks.
  *  - K2 ack-after-write: task outputs land in a staging directory;
  *    ONLY the driver-side `commit(epochId, …)` publishes them into the
  *    table directory (atomic renames). A failed epoch leaves nothing
  *    visible and replays — the same at-least-once contract as ack-only-
  *    after-successful-`Send`. Re-publishing an epoch overwrites its own
  *    files (names are (epoch, partition, attempt-agnostic)), so replayed
  *    epochs don't duplicate.
  *  - `compression=lz4` (default, `connection.go:58-60`): blocks are
  *    LZ4-framed on the wire; here each block file is written through
  *    `LZ4BlockOutputStream` (the codec Spark ships) as `.jsonl.lz4`.
  *  - `maxExecutionTimeSec` (default 60, `connection.go:55-57`): the
  *    server-side query ceiling becomes a writer-side ceiling — a task
  *    whose writer lifetime exceeds it aborts the epoch at the next
  *    block-flush boundary (the same contract as the reference, where an
  *    over-limit INSERT fails and the unacked batch replays; size epochs
  *    under the ceiling, or raise it, for legitimately long writes).
  *  - ping-on-open (`connection.go:69-72`): the write path is probed when
  *    the write is built, so an unreachable/unwritable target fails the
  *    query at start, not at first epoch commit.
  *
  * Rows serialize as JSON lines (schema-driven; string/long/int/double/
  * boolean/timestamp/binary).
  *
  * TWO wire paths, selected by options:
  *
  *  - default (no `url`): blocks land as LZ4-framed local files via
  *    stage-then-rename — the file-backed stand-in.
  *  - `url` = a `ch://user:pass@host:port` DSN (+ `table`): each block
  *    is POSTed over the PUBLIC ClickHouse HTTP interface as
  *    `INSERT INTO <table> FORMAT JSONEachRow` — a real wire path a
  *    real ClickHouse accepts (point the DSN at the HTTP port, 8123).
  *    Credentials ride as `X-ClickHouse-User`/`X-ClickHouse-Key`
  *    headers, `max_execution_time` as a query setting (the server-side
  *    ceiling `connection.go:55-57` configures), and `compression=lz4`
  *    frames each body (`Content-Encoding: lz4`, which the HTTP
  *    interface decompresses server-side — the LZ4-on-the-wire contract
  *    of `connection.go:58-60`). Ping-on-open probes `GET /ping`.
  *    Replayed epochs re-POST their blocks (at-least-once — the same
  *    contract as the reference; ClickHouse's Replicated* engines
  *    deduplicate identical re-inserted blocks by checksum).
  *
  * Usage:
  * {{{
  * df.writeStream.format("graft.sinks.BatchInsertSinkProvider")
  *   .option("path", dir).option("batchSize", 1000)
  *   .options(sinkConn.writerOptions)   // from a ch:// URL
  *   // add for the HTTP wire path:
  *   .option("url", "ch://user:pass@host:8123").option("table", "t")
  *   .option("checkpointLocation", cp).start()
  * }}}
  */
class BatchInsertSinkProvider extends TableProvider {
  // Sink-only: schema comes from the query via LogicalWriteInfo.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BatchInsertTable(
      properties.get("path"),
      Option(properties.get("batchSize")).map(_.toInt).getOrElse(1000),
      Option(properties.get("compression")).getOrElse("lz4"),
      Option(properties.get("maxExecutionTimeSec")).map(_.toInt).getOrElse(60),
      Option(properties.get("url")),
      Option(properties.get("table")).getOrElse("nats_data_all_streams"),
      Option(properties.get("insertFormat")).getOrElse("JSONEachRow"),
      Option(properties.get("wire")).getOrElse("http"))
}

final class BatchInsertTable(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int,
    url: Option[String], chTable: String,
    insertFormat: String = "JSONEachRow", wire: String = "http")
    extends Table with SupportsWrite {
  override def name(): String =
    url.fold(s"batch_insert($path)")(u => s"batch_insert($u/$chTable)")
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = url match {
          case Some(dsn) if wire.equalsIgnoreCase("native") =>
            // The reference's ACTUAL wire: native TCP protocol, LZ4
            // compressed blocks (`connection/connection.go:44-60`).
            val conn = graft.config.GraftConfig.parseSinkUrl(dsn)
              .fold(e => throw new IOException(e), identity)
            val target = NativeTarget(conn.host, conn.port, chTable,
              conn.user, conn.password)
            target.ping() // handshake + Ping/Pong (connection.go:69-72)
            new BatchInsertStreamingWrite(path, batchSize, compression,
              maxExecutionTimeSec, info.schema(), None, insertFormat,
              Some(target))
          case Some(dsn) =>
            val conn = graft.config.GraftConfig.parseSinkUrl(dsn)
              .fold(e => throw new IOException(e), identity)
            val target = HttpTarget(
              s"http://${conn.host}:${conn.port}", chTable,
              conn.user, conn.password)
            // Ping (connection.go:69-72): GET /ping — a live ClickHouse
            // answers 200 "Ok."; fail the query at start() otherwise.
            target.ping()
            new BatchInsertStreamingWrite(path, batchSize, compression,
              maxExecutionTimeSec, info.schema(), Some(target), insertFormat)
          case None =>
            // Ping: prove the target accepts writes BEFORE any epoch runs
            // — create the dir and round-trip a probe file.
            val dir = Paths.get(path)
            try {
              Files.createDirectories(dir)
              val probe = Files.createTempFile(dir, "_ping", "")
              Files.delete(probe)
            } catch {
              case e: Exception =>
                throw new IOException(s"sink ping failed for $path: $e")
            }
            new BatchInsertStreamingWrite(path, batchSize, compression,
              maxExecutionTimeSec, info.schema(), None)
        }
      }
    }
}

/** Serializable handle for the ClickHouse HTTP interface: one endpoint,
  * one target table; [[post]] sends one insert block.
  *
  * The table name is interpolated into the INSERT query string, so it is
  * validated against a strict identifier pattern at construction — a
  * malformed or attacker-influenced writer option must fail fast here,
  * not become arbitrary SQL (the reference binds the table through the
  * prepared-batch API, which has the same property). */
final case class HttpTarget(endpoint: String, table: String,
    user: String, password: String) {

  require(HttpTarget.TablePattern.matcher(table).matches(),
    s"illegal ClickHouse table name: '$table' " +
    "(expected [A-Za-z_][A-Za-z0-9_]* with optional db. qualifier)")

  def ping(): Unit = {
    val c = open(s"$endpoint/ping")
    c.setRequestMethod("GET")
    val rc =
      try c.getResponseCode
      catch { case e: IOException =>
        throw new IOException(s"sink ping failed for $endpoint: $e") }
    c.disconnect()
    if (rc != 200)
      throw new IOException(s"sink ping failed for $endpoint: HTTP $rc")
  }

  /** POST one block: `INSERT INTO <table> FORMAT <fmt>` with the
    * session settings in the query string; body optionally LZ4-framed
    * (`Content-Encoding: lz4`). Non-200 → IOException → task retry →
    * epoch replay (at-least-once). */
  def post(body: Array[Byte], lz4: Boolean, maxExecutionTimeSec: Int,
      format: String = "JSONEachRow"): Unit = {
    val q = java.net.URLEncoder.encode(
      s"INSERT INTO $table FORMAT $format", StandardCharsets.UTF_8)
    val c = open(s"$endpoint/?query=$q&max_execution_time=$maxExecutionTimeSec")
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    if (user.nonEmpty) c.setRequestProperty("X-ClickHouse-User", user)
    if (password.nonEmpty) c.setRequestProperty("X-ClickHouse-Key", password)
    if (lz4) c.setRequestProperty("Content-Encoding", "lz4")
    val out = c.getOutputStream
    val wire =
      if (lz4) new net.jpountz.lz4.LZ4FrameOutputStream(out) else out
    wire.write(body); wire.close()
    val rc = c.getResponseCode
    if (rc != 200) {
      val err = Option(c.getErrorStream).map { s =>
        try new String(s.readNBytes(512), StandardCharsets.UTF_8)
        finally s.close()
      }.getOrElse("")
      c.disconnect()
      throw new IOException(s"insert block rejected: HTTP $rc $err")
    }
    c.disconnect()
  }

  private def open(u: String): java.net.HttpURLConnection = {
    val c = java.net.URI.create(u).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(30000) // dial ceiling (connection.go:46)
    c.setReadTimeout(120000)
    c
  }
}

object HttpTarget {
  /** `ident` or `db.ident`, ClickHouse unquoted-identifier rules. */
  private[sinks] val TablePattern = java.util.regex.Pattern.compile(
    "[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)?")
}

/** stagedPath includes the task attempt id; fileName is the attempt-
  * agnostic published name, so a replayed epoch overwrites itself. */
final case class BlockFileCommit(stagedPath: String, fileName: String)
    extends WriterCommitMessage

/** HTTP-path commit message: blocks were already POSTed task-side. */
final case class HttpBlocksCommit(blocks: Int, rows: Long)
    extends WriterCommitMessage

final class BatchInsertStreamingWrite(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int,
    schema: StructType, http: Option[HttpTarget],
    insertFormat: String = "JSONEachRow",
    native: Option[NativeTarget] = None) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    BlockWriterFactory(path, batchSize, compression, maxExecutionTimeSec,
      schema, http, insertFormat, native)

  /** The single ack point: rename every staged block into the table dir.
    * Until this runs, nothing is visible (ack-after-write). On the HTTP
    * path tasks already Sent their blocks (clickhouse-go commits per
    * `Send`, `main.go:205-210`, before the batcher acks) — the epoch
    * commit is what lets the SOURCE advance its offsets, which is the
    * ack; nothing to publish here. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // wire paths (http/native) pass no `path` and have nothing staged
    val staged = messages.collect { case m: BlockFileCommit => m }
    if (staged.nonEmpty) {
      val dir = Paths.get(path)
      Files.createDirectories(dir)
      staged.foreach { case BlockFileCommit(stagedPath, name) =>
        Files.move(Paths.get(stagedPath), dir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** A failed epoch deletes its staged files (file path); HTTP blocks
    * already sent cannot be unsent — the epoch replays and re-POSTs
    * (at-least-once; Replicated* engines dedup identical blocks). */
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case BlockFileCommit(staged, _) => Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

/** Serializable factory shipped to tasks (must not capture the
  * driver-side StreamingWrite). */
final case class BlockWriterFactory(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int, schema: StructType,
    http: Option[HttpTarget], insertFormat: String = "JSONEachRow",
    native: Option[NativeTarget] = None)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = (native, http) match {
    case (Some(target), _) =>
      new NativeBlockWriter(target, batchSize, maxExecutionTimeSec, schema)
    case (None, Some(target)) =>
      new HttpBlockWriter(target, batchSize, compression,
        maxExecutionTimeSec, schema, insertFormat)
    case (None, None) =>
      new BlockWriter(path, batchSize, compression, maxExecutionTimeSec,
        schema, partitionId, taskId, epochId)
  }
}

/** Task-side native-wire writer: buffer row copies up to `batchSize`,
  * send each full buffer as ONE native columnar block over a lazily
  * opened, writer-lifetime connection (the `Append`×N → `Send` loop of
  * the reference, `main.go:153-212`, on its actual protocol). LZ4
  * framing is inherent to the wire (compression byte in the Query
  * packet), not an option here. */
final class NativeBlockWriter(target: NativeTarget, batchSize: Int,
    maxExecutionTimeSec: Int, schema: StructType)
    extends DataWriter[InternalRow] {

  private var conn: NativeConnection = null
  private val buffer = new ArrayBuffer[InternalRow](batchSize)
  private var blocks = 0
  private var rows = 0L
  private val startNanos = System.nanoTime()

  private def checkDeadline(): Unit = {
    val elapsedSec = (System.nanoTime() - startNanos) / 1e9
    if (elapsedSec > maxExecutionTimeSec) {
      // graceful teardown: Cancel packet first (the server stops any
      // in-flight query promptly), THEN close — not a bare socket abort
      if (conn != null) {
        try conn.cancel() catch { case _: IOException => () }
        try conn.close() catch { case _: IOException => () }
        conn = null
      }
      throw new IOException(
        s"max_execution_time (${maxExecutionTimeSec}s) exceeded after " +
        f"$elapsedSec%.1fs on block $blocks")
    }
  }

  private def flush(): Unit = if (buffer.nonEmpty) {
    checkDeadline()
    if (conn == null) conn = target.connect()
    conn.insert(target.table, schema, buffer.toSeq, maxExecutionTimeSec)
    blocks += 1
    rows += buffer.size
    buffer.clear()
  }

  override def write(row: InternalRow): Unit = {
    buffer += row.copy() // InternalRow is reused by the caller
    if (buffer.size >= batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    HttpBlocksCommit(blocks, rows)
  }

  override def abort(): Unit = buffer.clear()
  override def close(): Unit = if (conn != null) conn.close()
}

/** Task-side HTTP writer: buffer up to `batchSize` rows, POST each full
  * buffer as ONE insert block (the `Append`×N → `Send` loop over the
  * wire), final partial block on commit. `insertFormat` selects the wire
  * encoding: `JSONEachRow` (debuggable) or `RowBinary` (the
  * columnar-block-efficiency analogue of the reference's native-protocol
  * blocks, `connection/connection.go:58-60` — no field names, no text
  * numbers, varint-length strings). */
final class HttpBlockWriter(target: HttpTarget, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int, schema: StructType,
    insertFormat: String = "JSONEachRow")
    extends DataWriter[InternalRow] {

  private val lz4 = compression.equalsIgnoreCase("lz4")
  private val serializer: RowSerializer =
    if (insertFormat.equalsIgnoreCase("RowBinary"))
      new RowBinarySerializer(schema)
    else new JsonLineSerializer(schema)
  private val buffer = new java.io.ByteArrayOutputStream()
  private var buffered = 0
  private var blocks = 0
  private var rows = 0L
  private val startNanos = System.nanoTime()

  private def checkDeadline(): Unit = {
    val elapsedSec = (System.nanoTime() - startNanos) / 1e9
    if (elapsedSec > maxExecutionTimeSec)
      throw new IOException(
        s"max_execution_time (${maxExecutionTimeSec}s) exceeded after " +
        f"$elapsedSec%.1fs on block $blocks")
  }

  private def flush(): Unit = if (buffered > 0) {
    checkDeadline()
    target.post(buffer.toByteArray, lz4, maxExecutionTimeSec,
      serializer.format)
    blocks += 1
    rows += buffered
    buffer.reset()
    buffered = 0
  }

  override def write(row: InternalRow): Unit = {
    val b = serializer.rowBytes(row)
    buffer.write(b, 0, b.length)
    buffered += 1
    if (buffered >= batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    HttpBlocksCommit(blocks, rows)
  }

  override def abort(): Unit = { buffer.reset(); buffered = 0 }
  override def close(): Unit = ()
}

/** One row → wire bytes, under a named ClickHouse FORMAT. */
sealed trait RowSerializer extends Serializable {
  def format: String
  def rowBytes(row: InternalRow): Array[Byte]
}

/** Schema-driven row → JSON line serialization, shared by both wire
  * paths (string/long/int/double/boolean/timestamp/binary). */
final class JsonLineSerializer(schema: StructType) extends RowSerializer {

  override def format: String = "JSONEachRow"

  override def rowBytes(row: InternalRow): Array[Byte] =
    (jsonLine(row) + "\n").getBytes(StandardCharsets.UTF_8)

  private def esc(s: String): String = graft.util.JsonText.escape(s)

  def jsonLine(row: InternalRow): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType =>
            val d = row.getDouble(i)
            // NaN/Infinity are not valid JSON tokens; surface them as null
            // rather than emitting lines a strict consumer would reject
            if (java.lang.Double.isFinite(d)) d.toString else "null"
          case BooleanType => row.getBoolean(i).toString
          case TimestampType => row.getLong(i).toString // epoch micros
          case BinaryType => "\"" + java.util.Base64.getEncoder
            .encodeToString(row.getBinary(i)) + "\""
          case other => "\"" + esc(row.get(i, other).toString) + "\""
        }
      "\"" + f.name + "\":" + v
    }
    fields.mkString("{", ",", "}")
  }
}

/** Schema-driven row → ClickHouse RowBinary serialization (the PUBLIC
  * RowBinary format the HTTP interface accepts): values row-by-row in
  * column order, no names/delimiters — Strings and Binary as LEB128
  * varint length + bytes, Int32/Int64/Float64 little-endian fixed-width,
  * Boolean as UInt8, Timestamp as DateTime64(6) Int64 micros (Spark's
  * native resolution, lossless). A NULLABLE Spark field maps to
  * `Nullable(T)` (1-byte 0x00/0x01 null flag before each value, 0x01 =
  * NULL with no value bytes).
  *
  * This is the wire-efficiency analogue of the reference's native-
  * protocol columnar blocks (`connection/connection.go:58-60`):
  * JSONEachRow re-sends every field name and renders numbers as text on
  * every row; RowBinary sends each value once, in binary — the insert
  * bandwidth a real ClickHouse deployment actually achieves. */
final class RowBinarySerializer(schema: StructType) extends RowSerializer {

  override def format: String = "RowBinary"

  override def rowBytes(row: InternalRow): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.fields.length) {
      val f = schema.fields(i)
      val isNull = row.isNullAt(i)
      if (f.nullable) out.write(if (isNull) 1 else 0)
      else if (isNull)
        throw new IOException(
          s"null in non-nullable RowBinary column ${f.name}")
      if (!isNull) f.dataType match {
        case StringType => bytesVal(out, row.getUTF8String(i).getBytes)
        case LongType => fixed64(out, row.getLong(i))
        case IntegerType =>
          val v = row.getInt(i)
          out.write(v & 0xff); out.write((v >>> 8) & 0xff)
          out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
        case DoubleType =>
          fixed64(out, java.lang.Double.doubleToLongBits(row.getDouble(i)))
        case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
        case TimestampType => fixed64(out, row.getLong(i)) // DateTime64(6)
        case BinaryType => bytesVal(out, row.getBinary(i))
        case other =>
          bytesVal(out, row.get(i, other).toString
            .getBytes(StandardCharsets.UTF_8))
      }
      i += 1
    }
    out.toByteArray
  }

  private def bytesVal(out: java.io.ByteArrayOutputStream,
      b: Array[Byte]): Unit = {
    varint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  /** Unsigned LEB128 — RowBinary's length encoding. */
  private def varint(out: java.io.ByteArrayOutputStream, n0: Long): Unit = {
    var n = n0
    while ((n & ~0x7fL) != 0) {
      out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7
    }
    out.write(n.toInt)
  }

  private def fixed64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
}

/** Task-side writer: buffer up to `batchSize` rows, flush each full buffer
  * as one serialized block (the `Append`×N → `Send` loop), optionally
  * LZ4-framed, aborting if the task outlives `maxExecutionTimeSec`. */
final class BlockWriter(path: String, batchSize: Int, compression: String,
    maxExecutionTimeSec: Int, schema: StructType,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val lz4 = compression.equalsIgnoreCase("lz4")
  private val ext = if (lz4) "jsonl.lz4" else "jsonl"

  /** Published (attempt-agnostic) block name: replayed epochs overwrite. */
  private val published = f"epoch-$epochId%06d-part-$partitionId%05d.$ext"

  /** Staged per-ATTEMPT (taskId) so a retried/speculative attempt never
    * clobbers another attempt's file, and abort() deletes only its own. */
  private val staging = {
    val d = Paths.get(path, "_staging")
    Files.createDirectories(d)
    d.resolve(f"epoch-$epochId%06d-part-$partitionId%05d-task-$taskId.$ext")
  }
  private val out = {
    val raw = new FileOutputStream(staging.toFile)
    val stream = if (lz4) new LZ4BlockOutputStream(raw) else raw
    new BufferedWriter(new OutputStreamWriter(stream, StandardCharsets.UTF_8))
  }
  private val buffer = new ArrayBuffer[String](batchSize)
  private val startNanos = System.nanoTime()

  /** max_execution_time (connection.go:55-57), checked at each block
    * flush and at commit (an in-thread check cannot interrupt a write
    * blocked inside the OS — the guarantee is bounded EPOCHS, not
    * bounded syscalls). */
  private def checkDeadline(): Unit = {
    val elapsedSec = (System.nanoTime() - startNanos) / 1e9
    if (elapsedSec > maxExecutionTimeSec)
      throw new IOException(
        s"max_execution_time (${maxExecutionTimeSec}s) exceeded after " +
        f"$elapsedSec%.1fs writing block $published")
  }

  private val serializer = new JsonLineSerializer(schema)

  private def flush(): Unit = {
    checkDeadline()
    buffer.foreach { l => out.write(l); out.newLine() }
    buffer.clear()
  }

  override def write(row: InternalRow): Unit = {
    buffer += serializer.jsonLine(row)
    if (buffer.size >= batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush(); out.close()
    BlockFileCommit(staging.toString, published)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staging)
  }

  override def close(): Unit = ()
}
