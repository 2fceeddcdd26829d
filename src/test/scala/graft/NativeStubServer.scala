package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket, SocketException}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.types.StructType
import graft.sinks.{NativeBlockCodec, NativeFraming, NativeProto}

/** In-process ClickHouse NATIVE-protocol stub: the server half of the
  * packet grammar `graft.sinks.NativeWire` speaks — hello handshake,
  * Ping→Pong, and the INSERT cycle (Query → external-tables terminator →
  * header block → data blocks → EndOfStream). Every inbound compressed
  * frame goes through [[NativeFraming.readFrame]], so CityHash128
  * checksums are VERIFIED server-side; decoded rows accumulate in
  * [[rows]] for assertions. `failHello = true` turns it into an
  * auth-rejecting server (Exception packet in place of the hello);
  * `chatty = true` makes it interleave ProfileInfo and (uncompressed)
  * Log packets into the INSERT response, as a real server under
  * `send_logs_level` does — the client must skip them. */
final class NativeStubServer(schema: StructType, failHello: Boolean = false,
    chatty: Boolean = false) {
  import NativeProto._

  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort

  /** (columnName → value) maps, one per decoded inserted row. */
  val rows = new ArrayBuffer[Map[String, Any]]()
  val queries = new ArrayBuffer[String]()
  val settings = new ArrayBuffer[(String, String)]()
  @volatile var framesSeen = 0

  private val acceptThread = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      serve(s) // sink writers connect sequentially in these specs
    } catch { case _: SocketException | _: EOFException => () }
  }, "native-stub-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(socket: Socket): Unit = {
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    try {
      // client hello
      require(readVarint(in) == ClientHello, "expected client hello")
      readString(in) // client name
      readVarint(in); readVarint(in) // client version
      val clientRev = readVarint(in)
      readString(in); readString(in); readString(in) // db, user, password
      if (failHello) {
        writeVarint(out, ServerException)
        writeInt32(out, 516) // AUTHENTICATION_FAILED
        writeString(out, "DB::Exception")
        writeString(out, "Authentication failed")
        writeString(out, "") // stack trace
        out.write(0) // no nested
        out.flush()
        return
      }
      writeVarint(out, ServerHello)
      writeString(out, "GraftStubClickHouse")
      writeVarint(out, 23L); writeVarint(out, 8L)
      writeVarint(out, ClientRevision) // same pinned revision
      val eff = math.min(clientRev, ClientRevision)
      if (eff >= MinRevisionWithServerTimezone) writeString(out, "UTC")
      if (eff >= MinRevisionWithServerDisplayName) writeString(out, "stub")
      if (eff >= MinRevisionWithVersionPatch) writeVarint(out, 0L)
      out.flush()

      var open = true
      while (open) {
        val pkt =
          try readVarint(in)
          catch { case _: EOFException => open = false; -1L }
        pkt match {
          case -1L => ()
          case ClientPing =>
            writeVarint(out, ServerPong); out.flush()
          case ClientQuery =>
            readString(in) // query id
            if (eff >= MinRevisionWithClientInfo) {
              in.read() // query kind
              readString(in); readString(in); readString(in)
              in.read() // interface
              readString(in); readString(in); readString(in)
              readVarint(in); readVarint(in); readVarint(in)
              if (eff >= MinRevisionWithQuotaKey) readString(in)
              if (eff >= MinRevisionWithVersionPatch) readVarint(in)
            }
            // settings as strings (≥54429): (name, flags, value) triples
            // until the empty-name terminator
            var setting = readString(in)
            while (setting.nonEmpty) {
              readVarint(in) // flags
              settings += setting -> readString(in)
              setting = readString(in)
            }
            readVarint(in) // stage
            val compression = readVarint(in)
            require(compression == CompressionEnabled,
              "stub expects compressed wire")
            queries += readString(in)
            readDataPacket(in) // external-tables terminator (empty)
            // header block: the table structure, zero rows
            writeVarint(out, ServerData)
            writeString(out, "")
            NativeFraming.writeFrame(out,
              NativeBlockCodec.encode(schema, Seq.empty))
            out.flush()
            // data blocks until the empty terminator
            var block = readDataPacket(in)
            while (block.rows > 0) {
              val cols = block.columns
              (0 until block.rows).foreach { r =>
                rows += cols.map(c => c.name -> c.values(r)).toMap
              }
              block = readDataPacket(in)
            }
            // progress (+ profile/log chatter) + end of stream
            writeVarint(out, ServerProgress)
            writeVarint(out, rows.size.toLong); writeVarint(out, 0L)
            writeVarint(out, 0L)
            if (chatty) {
              writeVarint(out, ServerProfileInfo)
              writeVarint(out, rows.size.toLong) // rows
              writeVarint(out, 1L) // blocks
              writeVarint(out, 0L) // bytes
              out.write(0) // applied_limit
              writeVarint(out, 0L) // rows_before_limit
              out.write(0) // calculated_rows_before_limit
              // Log packet: block rides UNCOMPRESSED, always
              writeVarint(out, ServerLog)
              writeString(out, "")
              out.write(NativeBlockCodec.encode(
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("text",
                    org.apache.spark.sql.types.StringType, nullable = false))),
                Seq(new org.apache.spark.sql.catalyst.expressions
                  .GenericInternalRow(Array[Any](
                    org.apache.spark.unsafe.types.UTF8String
                      .fromString("stub log line"))))))
            }
            writeVarint(out, ServerEndOfStream)
            out.flush()
          case other =>
            throw new IOException(s"stub: unexpected client packet $other")
        }
      }
    } finally socket.close()
  }

  private def readDataPacket(in: java.io.InputStream)
      : NativeBlockCodec.DecodedBlock = {
    require(readVarint(in) == ClientData, "expected client data packet")
    readString(in) // temporary-table name
    framesSeen += 1
    NativeBlockCodec.decode(NativeFraming.readFrame(in))
  }

  def close(): Unit = server.close()
}
