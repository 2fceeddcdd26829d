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
  * boolean/timestamp/binary). A production build swaps the serializer for
  * the native wire protocol and nothing else changes.
  *
  * Usage:
  * {{{
  * df.writeStream.format("graft.sinks.BatchInsertSinkProvider")
  *   .option("path", dir).option("batchSize", 1000)
  *   .options(sinkConn.writerOptions)   // from a ch:// URL
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
      Option(properties.get("maxExecutionTimeSec")).map(_.toInt).getOrElse(60))
}

final class BatchInsertTable(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int)
    extends Table with SupportsWrite {
  override def name(): String = s"batch_insert($path)"
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          // Ping (connection.go:69-72): prove the target accepts writes
          // BEFORE any epoch runs — create the dir and round-trip a probe
          // file, failing the query at start() on an unusable target.
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
            maxExecutionTimeSec, info.schema())
        }
      }
    }
}

/** stagedPath includes the task attempt id; fileName is the attempt-
  * agnostic published name, so a replayed epoch overwrites itself. */
final case class BlockFileCommit(stagedPath: String, fileName: String)
    extends WriterCommitMessage

final class BatchInsertStreamingWrite(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int,
    schema: StructType) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    BlockWriterFactory(path, batchSize, compression, maxExecutionTimeSec,
      schema)

  /** The single ack point: rename every staged block into the table dir.
    * Until this runs, nothing is visible (ack-after-write). */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    messages.foreach {
      case BlockFileCommit(staged, name) =>
        Files.move(Paths.get(staged), dir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      case _ => ()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case BlockFileCommit(staged, _) => Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

/** Serializable factory shipped to tasks (must not capture the
  * driver-side StreamingWrite). */
final case class BlockWriterFactory(path: String, batchSize: Int,
    compression: String, maxExecutionTimeSec: Int, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new BlockWriter(path, batchSize, compression, maxExecutionTimeSec,
      schema, partitionId, taskId, epochId)
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

  private def esc(s: String): String = graft.util.JsonText.escape(s)

  private def jsonLine(row: InternalRow): String = {
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

  private def flush(): Unit = {
    checkDeadline()
    buffer.foreach { l => out.write(l); out.newLine() }
    buffer.clear()
  }

  override def write(row: InternalRow): Unit = {
    buffer += jsonLine(row)
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
