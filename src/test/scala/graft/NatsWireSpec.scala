package graft

import java.io.{BufferedOutputStream, DataInputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{NatsCapture, NatsMsg, NatsSocketClient, NatsWire, ReplayPartition, ReplayReader}

/** A stub NATS server speaking the same public text protocol the client
  * dials: INFO greeting, CONNECT/SUB accepted, queued messages pushed as
  * MSG frames after SUB, a PING mid-stream, PUBs (acks) recorded. One
  * client, one session — enough to prove the dial path end to end. */
final class StubNatsServer(
    messages: Seq[(String, Option[String], String)],
    onAck: String => Unit = _ => ()) {

  val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  val pongs = new ConcurrentLinkedQueue[String]()
  val acks = new ConcurrentLinkedQueue[String]()
  val subs = new ConcurrentLinkedQueue[String]()
  val done = new CountDownLatch(1)

  private val thread = new Thread(() => {
    try {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def send(line: String): Unit = {
        out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
      }
      def readLine(): String = {
        val b = new java.io.ByteArrayOutputStream(64)
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') b.write(c); c = in.read() }
        if (c == -1 && b.size() == 0) throw new java.io.EOFException
        new String(b.toByteArray, StandardCharsets.UTF_8)
      }
      send("""INFO {"server_id":"stub","version":"0.0-test","max_payload":1048576}""")
      var open = true
      while (open) {
        val line = try readLine() catch { case _: java.io.EOFException => open = false; "" }
        if (open) {
          if (line.startsWith("SUB ")) {
            subs.add(line.drop(4))
            val sid = line.trim.split("\\s+").last
            // push the backlog, a PING in the middle (keep-alive check)
            messages.zipWithIndex.foreach { case ((subj, reply, payload), i) =>
              if (i == messages.size / 2) send("PING")
              val p = payload.getBytes(StandardCharsets.UTF_8)
              val hdr = reply.fold(s"MSG $subj $sid ${p.length}")(r =>
                s"MSG $subj $sid $r ${p.length}")
              send(hdr)
              out.write(p); out.write('\r'); out.write('\n'); out.flush()
            }
          } else if (line.startsWith("PUB ")) {
            // PUB <subject> <#bytes>\r\n<payload>\r\n
            val p = line.drop(4).trim.split("\\s+")
            val n = p.last.toInt
            val payload = new Array[Byte](n)
            in.readFully(payload)
            in.readByte(); in.readByte()
            onAck(p(0))
            acks.add(p(0))
          } else if (line == "PONG") pongs.add(line)
          // CONNECT / anything else: accept silently
        }
      }
    } catch { case _: Exception => () }
    finally done.countDown()
  })
  thread.setDaemon(true)
  thread.start()

  def close(): Unit = { try server.close() catch { case _: Exception => () } }
}

class NatsWireSpec extends AnyFunSuite {

  test("nats:// URL parse: default port, explicit port, rejects junk (S3)") {
    assert(NatsWire.parseUrl("nats://broker") === Right(("broker", 4222)))
    assert(NatsWire.parseUrl("nats://broker:14222") === Right(("broker", 14222)))
    assert(NatsWire.parseUrl("nats://broker:0").isLeft)
    assert(NatsWire.parseUrl("nats://broker:999999").isLeft)
    assert(NatsWire.parseUrl("http://broker:4222").isLeft)
    assert(NatsWire.parseUrl("nats://").isLeft)
  }

  test("JetStream ACK subject parse: v1 form, domain form, non-ACK rejected") {
    val v1 = NatsWire.jetStreamMeta("$JS.ACK.EVENTS.dur.2.42.7.1704067200000000000.5")
    assert(v1.contains(graft.sources.JsMeta("EVENTS", "dur", 2L, 42L, 7L,
      1704067200000000000L, 5L)))
    // domain-qualified (v2) forms append tokens at the FRONT; the last
    // seven stay the metadata
    val v2 = NatsWire.jetStreamMeta(
      "$JS.ACK.hub._9hv.EVENTS.dur.1.100.3.1704067200000000000.0")
    assert(v2.exists(m => m.streamSeq == 100L && m.stream == "EVENTS"))
    assert(NatsWire.jetStreamMeta("_INBOX.abc123").isEmpty)
    assert(NatsWire.jetStreamMeta("$JS.ACK.EVENTS.dur.x.y.z.t.p").isEmpty)
  }

  test("dial path: INFO/CONNECT handshake, SUB, MSG delivery, PING->PONG (S1)") {
    val stub = new StubNatsServer(Seq(
      ("globex.supprt.u1", None, """{"text":"a"}"""),
      ("globex.supprt.u2", Some("$JS.ACK.EVENTS.dur.1.11.1.1704067200000000000.2"),
        """{"text":"b"}"""),
      ("globex.supprt.u3", None, """{"text":"c"}""")))
    try {
      val c = new NatsSocketClient("127.0.0.1", stub.port, readTimeoutMs = 1500)
      c.connect()
      assert(c.info.contains("\"server_id\":\"stub\""))
      c.subscribe("globex.supprt.>", sid = "1",
        queue = Some("nats-clickhouse-delivery-group"))
      val got = Iterator.continually(c.next()).takeWhile(_.isDefined)
        .flatten.toList
      assert(got.map(_.subject) ===
        List("globex.supprt.u1", "globex.supprt.u2", "globex.supprt.u3"))
      assert(new String(got(1).payload, StandardCharsets.UTF_8) === """{"text":"b"}""")
      assert(got(1).reply.exists(_.startsWith("$JS.ACK.")))
      assert(got(0).reply.isEmpty)
      // queue-grouped SUB reached the server; the PING got its PONG
      c.close()
      stub.done.await(3, TimeUnit.SECONDS)
      assert(stub.subs.asScala.exists(_.startsWith(
        "globex.supprt.> nats-clickhouse-delivery-group")))
      assert(stub.pongs.size() === 1)
    } finally stub.close()
  }

  test("capture: JetStream metadata lands in the envelope; acks AFTER the file (K2)") {
    val dir = Files.createTempDirectory("graft_nats_cap").toString
    // records whether the backlog file was already visible at each ack —
    // the ack-after-write ordering assertion
    val fileAtAck = new ConcurrentLinkedQueue[Boolean]()
    def backlogVisible(): Boolean = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.exists(_.toString.endsWith(".jsonl"))
      finally s.close()
    }
    val stub = new StubNatsServer(
      Seq(
        ("globex.supprt.u1",
          Some("$JS.ACK.EVENTS.dur.1.41.1.1704067200000000000.2"), """{"k":1}"""),
        ("globex.supprt.u2",
          Some("$JS.ACK.EVENTS.dur.1.42.2.1704070800000000000.1"), """{"k":2}"""),
        ("globex.crmabc.u3", None, """{"k":3}""")),
      onAck = _ => fileAtAck.add(backlogVisible()))
    try {
      val n = NatsCapture.capture(s"nats://127.0.0.1:${stub.port}",
        "globex.>", dir, maxMsgs = 10, maxWaitMs = 1500)
      assert(n === 3)
      stub.done.await(3, TimeUnit.SECONDS)
      // two JetStream deliveries acked, both after the rename
      assert(stub.acks.asScala.toList.forall(_.startsWith("$JS.ACK.")))
      assert(stub.acks.size() === 2)
      assert(fileAtAck.asScala.toList === List(true, true))
      // the captured file parses through the REAL replay reader
      val files = Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".jsonl")).toList
      assert(files.size === 1)
      val reader = new ReplayReader(ReplayPartition(files.head.toString, 0, 10))
      val rows = Iterator.continually(reader.next()).takeWhile(identity)
        .map(_ => reader.get().copy()).toList
      reader.close()
      assert(rows.size === 3)
      // JetStream stream sequences carried through; the core-NATS
      // fallback is globally unique: fileMillis << 20 | position (a
      // per-file counter would collide across capture files and be
      // dropped by dedupedRaw's sequence-keyed suppression)
      val fileMillis = files.head.getFileName.toString
        .stripPrefix("capture-").stripSuffix(".jsonl").toLong
      assert(rows.map(_.getLong(3)) ===
        List(41L, 42L, (fileMillis << 20) | 3L))
      // publish timestamp from the ACK subject (nanos -> micros)
      assert(rows.head.getLong(2) === 1704067200000000L)
    } finally stub.close()
  }

  test("core-NATS fallback sequences are unique ACROSS capture files") {
    val msgs = Seq(
      NatsMsg("s.a", "1", None, "{\"k\":1}".getBytes(StandardCharsets.UTF_8)),
      NatsMsg("s.b", "1", None, "{\"k\":2}".getBytes(StandardCharsets.UTF_8)))
    def seqs(fileMillis: Long): Seq[Long] =
      NatsCapture.envelopeLines(msgs, fileMillis).linesIterator
        .map(l => l.split("\"streamSeq\":")(1).stripSuffix("}").toLong)
        .toSeq
    val f1 = seqs(1704067200000L)
    val f2 = seqs(1704067200001L) // next capture file, 1 ms later
    assert(f1.distinct.size === 2 && f2.distinct.size === 2)
    assert((f1.toSet intersect f2.toSet).isEmpty,
      "distinct messages in different capture files must not share streamSeq")
  }

  test("timeout mid-MSG-payload kills the connection instead of desyncing") {
    // a server that sends a MSG header promising 100 bytes but only 5,
    // then stalls — the client must not return None and stay usable
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val out = new BufferedOutputStream(s.getOutputStream)
        def send(line: String): Unit = {
          out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
        }
        send("""INFO {"server_id":"stub"}""")
        // swallow CONNECT/SUB lines without parsing; then the truncated MSG
        Thread.sleep(300)
        send("MSG s.a 1 100") // header promises 100 payload bytes...
        out.write("hello".getBytes(StandardCharsets.UTF_8)); out.flush() // ...sends 5
        Thread.sleep(3000)
        s.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val c = new NatsSocketClient("127.0.0.1", server.getLocalPort,
        readTimeoutMs = 500)
      c.connect()
      c.subscribe("s.>", sid = "1")
      val e = intercept[java.io.IOException] { c.next() }
      assert(e.getMessage.contains("mid-MSG payload"))
      // the client is dead: further use fails loudly, never misparses
      intercept[java.io.IOException] { c.next() }
    } finally server.close()
  }

  test("unreachable broker fails the dial fast (reference exits on bad URL)") {
    val dead = new ServerSocket(0)
    val port = dead.getLocalPort
    dead.close() // nothing listens here anymore
    val c = new NatsSocketClient("127.0.0.1", port, connectTimeoutMs = 500)
    intercept[java.io.IOException] { c.connect() }
  }

  // ---- JetStream consumer lifecycle ($JS.API.CONSUMER.*) -------------

  import graft.sources.JetStreamApi

  private val Group = "nats-clickhouse-delivery-group"

  test("consumer lifecycle: first run CREATES the durable (INFO 404 -> " +
      "DURABLE.CREATE), delivery flows with $JS.ACK metadata") {
    val broker = new StubJetStreamBroker("EVENTS", Seq(
      ("globex.supprt.u1", """{"k":1}"""),
      ("globex.supprt.u2", """{"k":2}"""),
      ("globex.supprt.u3", """{"k":3}""")))
    try {
      val c = new NatsSocketClient("127.0.0.1", broker.port, readTimeoutMs = 1500)
      c.connect()
      val info = JetStreamApi.ensureDurable(c, "EVENTS", "monitor",
        filterSubject = "globex.>",
        deliverSubject = "_INBOX.graft.monitor.deliver",
        deliverGroup = Group)
      assert(info.created, "first run must CREATE the consumer")
      assert(info.stream === "EVENTS" && info.name === "monitor")
      assert(info.deliverSubject === "_INBOX.graft.monitor.deliver")
      assert(info.deliverGroup === Group)
      // the wire saw INFO first (404), then the durable create
      assert(broker.infoRequests.size() === 1)
      assert(broker.createRequests.size() === 1)
      // push delivery to the DELIVER subject, metadata in the ACK reply
      c.subscribe(info.deliverSubject, sid = "7", queue = Some(Group))
      val got = Iterator.continually(c.next()).takeWhile(_.isDefined)
        .flatten.toList
      assert(got.map(_.subject) ===
        List("globex.supprt.u1", "globex.supprt.u2", "globex.supprt.u3"))
      val metas = got.flatMap(_.reply).flatMap(NatsWire.jetStreamMeta)
      assert(metas.map(_.streamSeq) === List(1L, 2L, 3L))
      assert(metas.forall(m => m.numDelivered == 1L && m.stream == "EVENTS"))
      got.foreach(c.ack)
      c.close()
    } finally broker.close()
  }

  test("consumer lifecycle: reconnect RESUMES the durable (no re-create), " +
      "preserving the cursor; unacked deliveries redeliver with " +
      "num_delivered > 1 for the dedup stage downstream") {
    val broker = new StubJetStreamBroker("EVENTS", Seq(
      ("globex.supprt.u1", """{"k":1}"""),
      ("globex.supprt.u2", """{"k":2}"""),
      ("globex.supprt.u3", """{"k":3}""")))
    try {
      // session 1: create, drain all three, ack ONLY the first — then
      // "crash" (close without acking 2 and 3)
      val c1 = new NatsSocketClient("127.0.0.1", broker.port, readTimeoutMs = 1500)
      c1.connect()
      val i1 = JetStreamApi.ensureDurable(c1, "EVENTS", "monitor",
        "globex.>", "_INBOX.graft.monitor.deliver", Group)
      assert(i1.created)
      c1.subscribe(i1.deliverSubject, sid = "1", queue = Some(Group))
      val first = Iterator.continually(c1.next()).takeWhile(_.isDefined)
        .flatten.toList
      assert(first.size === 3)
      c1.ack(first.head) // seq 1 acked; 2 and 3 die with the session
      Thread.sleep(100) // let the ack PUB land before the socket drops
      c1.close()

      // session 2: the restart. INFO finds the durable — no CREATE —
      // with the cursor where session 1 left it; subscribing to the SAME
      // deliver subject redelivers exactly the unacked tail, marked
      // num_delivered=2 (what ReplaySource's dedup keys on, B5)
      val c2 = new NatsSocketClient("127.0.0.1", broker.port, readTimeoutMs = 1500)
      c2.connect()
      val i2 = JetStreamApi.ensureDurable(c2, "EVENTS", "monitor",
        "globex.>", "_INBOX.graft.SHOULD-NOT-BE-USED", Group)
      assert(!i2.created, "restart must RESUME, not re-create")
      assert(broker.createRequests.size() === 1, "exactly one create ever")
      assert(i2.deliverSubject === "_INBOX.graft.monitor.deliver",
        "resume must return the deliver subject the consumer was created with")
      assert(i2.ackFloorStreamSeq === 1L)
      assert(i2.deliveredStreamSeq === 3L)
      c2.subscribe(i2.deliverSubject, sid = "1", queue = Some(Group))
      val second = Iterator.continually(c2.next()).takeWhile(_.isDefined)
        .flatten.toList
      val metas = second.flatMap(_.reply).flatMap(NatsWire.jetStreamMeta)
      assert(metas.map(_.streamSeq) === List(2L, 3L), "only the unacked tail")
      assert(metas.forall(_.numDelivered === 2L))
      second.foreach(c2.ack)
      c2.close()
    } finally broker.close()
  }

  test("capture with jetStream lifecycle: two capture runs land every " +
      "stream seq exactly once across backlog files") {
    val dir = Files.createTempDirectory("graft_js_cap").toString
    val broker = new StubJetStreamBroker("EVENTS",
      (1 to 5).map(i => (s"globex.supprt.u$i", s"""{"k":$i}""")))
    try {
      // first capture run: resolves the stream from the subject
      // (STREAM.NAMES), creates the durable, drains, acks after write
      val n1 = NatsCapture.capture(s"nats://127.0.0.1:${broker.port}",
        "globex.>", dir, maxMsgs = 3, maxWaitMs = 1500,
        durable = Some("monitor"))
      assert(n1 === 3)
      // second run resumes the SAME durable: only the unacked tail
      val n2 = NatsCapture.capture(s"nats://127.0.0.1:${broker.port}",
        "globex.>", dir, maxMsgs = 10, maxWaitMs = 1500,
        durable = Some("monitor"))
      assert(n2 === 2)
      assert(broker.createRequests.size() === 1)
      // both backlog files together carry stream seqs 1..5, once each
      val files = Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".jsonl")).toList.sortBy(_.toString)
      assert(files.size === 2)
      val seqs = files.flatMap { f =>
        val reader = new ReplayReader(ReplayPartition(f.toString, 0, 100))
        val rows = Iterator.continually(reader.next()).takeWhile(identity)
          .map(_ => reader.get().getLong(3)).toList
        reader.close()
        rows
      }
      assert(seqs.sorted === List(1L, 2L, 3L, 4L, 5L))
    } finally broker.close()
  }
}
