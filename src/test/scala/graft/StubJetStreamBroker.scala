package graft

import java.io.{BufferedOutputStream, DataInputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.mutable

/** A stub NATS server with enough JetStream to exercise the consumer
  * LIFECYCLE: the `$JS.API.CONSUMER.INFO` / `DURABLE.CREATE` request
  * surface, push delivery to the consumer's deliver subject with
  * `$JS.ACK` reply subjects, per-message ack tracking, an ack floor,
  * and REDELIVERY of unacked messages (num_delivered increments) when a
  * session reconnects — the server half of `nats.Durable(...)`
  * semantics. Sessions are served sequentially; state (consumers, acks,
  * delivery counts) survives across sessions, which is the whole point.
  *
  * The stream holds `messages` with stream sequences 1..N assigned in
  * order. Publish timestamps are deterministic from the sequence.
  */
final class StubJetStreamBroker(stream: String,
    messages: Seq[(String, String)]) {

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  /** Registered durable consumers: name → config + delivery state. */
  final class ConsumerState(val deliverSubject: String,
      val deliverGroup: String, val filterSubject: String) {
    val acked = mutable.Set.empty[Long]
    val numDelivered = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var deliveredStreamSeq = 0L
    def ackFloor: Long = {
      var f = 0L
      while (acked.contains(f + 1)) f += 1
      f
    }
  }
  val consumers = new mutable.LinkedHashMap[String, ConsumerState]()
  val infoRequests = new ConcurrentLinkedQueue[String]()
  val createRequests = new ConcurrentLinkedQueue[String]()

  private val acceptThread = new Thread(() => {
    try while (!server.isClosed) serve(server.accept())
    catch { case _: SocketException | _: EOFException => () }
  }, "js-stub-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    // sid by subscribed subject, for MSG frames
    val sids = mutable.Map.empty[String, String]
    def send(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
    }
    def sendMsg(subject: String, sid: String, reply: Option[String],
        payload: Array[Byte]): Unit = {
      val hdr = reply.fold(s"MSG $subject $sid ${payload.length}")(r =>
        s"MSG $subject $sid $r ${payload.length}")
      send(hdr)
      out.write(payload); out.write('\r'); out.write('\n'); out.flush()
    }
    def readLine(): String = {
      val b = new java.io.ByteArrayOutputStream(64)
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') b.write(c); c = in.read() }
      if (c == -1 && b.size() == 0) throw new EOFException
      new String(b.toByteArray, StandardCharsets.UTF_8)
    }
    def consumerInfoJson(name: String, c: ConsumerState): String =
      s"""{"type":"io.nats.jetstream.api.v1.consumer_info_response",""" +
      s""""stream_name":"$stream","name":"$name","config":{""" +
      s""""durable_name":"$name","deliver_subject":"${c.deliverSubject}",""" +
      s""""deliver_group":"${c.deliverGroup}",""" +
      s""""filter_subject":"${c.filterSubject}","ack_policy":"explicit"},""" +
      s""""delivered":{"consumer_seq":${c.deliveredStreamSeq},""" +
      s""""stream_seq":${c.deliveredStreamSeq}},""" +
      s""""ack_floor":{"consumer_seq":${c.ackFloor},"stream_seq":${c.ackFloor}},""" +
      s""""num_pending":${messages.size - c.deliveredStreamSeq}}"""
    def deliverPending(c: ConsumerState, name: String, sid: String): Unit =
      messages.zipWithIndex.foreach { case ((subj, payload), i) =>
        val seq = i + 1L
        if (!c.acked.contains(seq)) {
          c.numDelivered(seq) += 1
          c.deliveredStreamSeq = math.max(c.deliveredStreamSeq, seq)
          val tsNanos = 1704067200000000000L + seq * 1000000000L
          val pending = messages.size - seq
          val reply = s"$$JS.ACK.$stream.$name.${c.numDelivered(seq)}.$seq" +
            s".$seq.$tsNanos.$pending"
          sendMsg(subj, sid, Some(reply),
            payload.getBytes(StandardCharsets.UTF_8))
        }
      }
    try {
      send("""INFO {"server_id":"js-stub","version":"0.0-test","jetstream":true,"max_payload":1048576}""")
      var open = true
      while (open) {
        val line = try readLine() catch { case _: EOFException => open = false; "" }
        if (open) {
          if (line.startsWith("SUB ")) {
            val p = line.drop(4).trim.split("\\s+")
            val (subject, sid) = (p(0), p.last)
            sids(subject) = sid
            // subscribing to a registered consumer's deliver subject
            // starts (re)delivery of everything above its acks
            consumers.find(_._2.deliverSubject == subject).foreach {
              case (name, c) => deliverPending(c, name, sid)
            }
          } else if (line.startsWith("PUB ")) {
            val p = line.drop(4).trim.split("\\s+")
            val subject = p(0)
            val reply = if (p.length == 3) Some(p(1)) else None
            val n = p.last.toInt
            val payload = new Array[Byte](n)
            in.readFully(payload)
            in.readByte(); in.readByte()
            val body = new String(payload, StandardCharsets.UTF_8)
            if (subject == "$JS.API.STREAM.NAMES") {
              // subject-filtered stream lookup: this broker owns ONE
              // stream and claims every subject (filter unchecked)
              val resp =
                s"""{"type":"io.nats.jetstream.api.v1.stream_names_response",""" +
                s""""total":1,"offset":0,"limit":1024,"streams":["$stream"]}"""
              reply.foreach(r =>
                sendMsg(r, sids.getOrElse(r, "0"), None,
                  resp.getBytes(StandardCharsets.UTF_8)))
            } else if (subject.startsWith(s"$$JS.API.CONSUMER.INFO.$stream.")) {
              val name = subject.split('.').last
              infoRequests.add(name)
              val resp = consumers.get(name) match {
                case Some(c) => consumerInfoJson(name, c)
                case None =>
                  """{"type":"io.nats.jetstream.api.v1.consumer_info_response",""" +
                  """"error":{"code":404,"err_code":10014,""" +
                  """"description":"consumer not found"}}"""
              }
              reply.foreach(r =>
                sendMsg(r, sids.getOrElse(r, "0"), None,
                  resp.getBytes(StandardCharsets.UTF_8)))
            } else if (subject.startsWith(
                s"$$JS.API.CONSUMER.DURABLE.CREATE.$stream.")) {
              val name = subject.split('.').last
              createRequests.add(name)
              def field(k: String): String =
                s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(body)
                  .map(_.group(1)).getOrElse("")
              val c = new ConsumerState(field("deliver_subject"),
                field("deliver_group"), field("filter_subject"))
              consumers(name) = c
              reply.foreach(r =>
                sendMsg(r, sids.getOrElse(r, "0"), None,
                  consumerInfoJson(name, c)
                    .getBytes(StandardCharsets.UTF_8)))
            } else if (subject.startsWith("$JS.ACK.")) {
              // $JS.ACK.<stream>.<consumer>.<delivered>.<sseq>.…
              val t = subject.split('.')
              if (t.length >= 9) {
                val name = t(t.length - 6)
                val seq = t(t.length - 4).toLong
                consumers.get(name).foreach(_.acked += seq)
              }
            }
            // other PUBs: accept silently
          } else if (line == "PONG" || line.startsWith("CONNECT") ||
              line.startsWith("UNSUB")) {
            // fine
          } else if (line == "PING") send("PONG")
        }
      }
    } catch { case _: SocketException => () }
    finally socket.close()
  }

  def close(): Unit = { try server.close() catch { case _: Exception => () } }
}
