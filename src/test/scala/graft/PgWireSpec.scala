package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.PgOutput
import graft.sources.{PgReplicationClient, PgWire}

/** [[graft.sources.PgWire]]/[[PgReplicationClient]] against an in-JVM
  * fake walsender speaking the real v3 byte layouts: startup/auth,
  * IDENTIFY_SYSTEM over simple query, START_REPLICATION → CopyBoth,
  * XLogData + keepalive inbound, StandbyStatusUpdate acks outbound,
  * ErrorResponse propagation. Same pattern as the sink family's fake
  * brokers — the bytes on the wire are the contract under test. */
class PgWireSpec extends AnyFunSuite {

  // ---- fake walsender ----

  private class FakeWalsender(failSlot: Boolean = false, authMd5: Boolean = false) {
    val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile var startupParams: Map[String, String] = Map.empty
    @volatile var acks: List[PgOutput.StandbyStatusUpdate] = Nil
    @volatile var sawStartReplication: String = ""
    val done = new CountDownLatch(1)

    private def writeBackend(o: DataOutputStream, tag: Char, payload: Array[Byte]): Unit = {
      o.writeByte(tag); o.writeInt(4 + payload.length); o.write(payload); o.flush()
    }
    private def cstr(b: ByteArrayOutputStream, s: String): Unit = {
      b.write(s.getBytes(UTF_8)); b.write(0)
    }
    private def xlogData(lsn: Long, msg: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(25 + msg.length)
      bb.put('w'.toByte).putLong(lsn).putLong(lsn + msg.length).putLong(0L).put(msg)
      bb.array()
    }

    private def serve(): Unit = {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      // startup: Int32 len (self-inclusive), Int32 proto, k\0v\0…\0
      val len = in.readInt()
      val body = new Array[Byte](len - 4); in.readFully(body)
      val bb = ByteBuffer.wrap(body)
      assert(bb.getInt == PgWire.ProtocolV3)
      val params = scala.collection.mutable.Map[String, String]()
      while (bb.remaining() > 1) {
        def cstrAt(): String = {
          val sb = new StringBuilder; var c = bb.get()
          while (c != 0) { sb.append(c.toChar); c = bb.get() }
          sb.toString()
        }
        val k = cstrAt(); if (k.nonEmpty) params(k) = cstrAt()
      }
      startupParams = params.toMap
      if (authMd5) { // demand md5: client must refuse loudly
        val p = ByteBuffer.allocate(8).putInt(5).putInt(0x01020304).array()
        writeBackend(out, 'R', p); s.close(); done.countDown(); return
      }
      writeBackend(out, 'R', ByteBuffer.allocate(4).putInt(0).array()) // AuthenticationOk
      val ps = new ByteArrayOutputStream(); cstr(ps, "server_version"); cstr(ps, "16.3")
      writeBackend(out, 'S', ps.toByteArray)
      writeBackend(out, 'K', ByteBuffer.allocate(8).putInt(7).putInt(42).array())
      writeBackend(out, 'Z', Array('I'.toByte))
      // IDENTIFY_SYSTEM
      def readQuery(): String = {
        val tag = in.read(); assert(tag == 'Q', s"expected Q got $tag")
        val l = in.readInt(); val b = new Array[Byte](l - 4); in.readFully(b)
        new String(b, 0, b.length - 1, UTF_8)
      }
      assert(readQuery() == "IDENTIFY_SYSTEM")
      val rd = new ByteArrayOutputStream(); val ro = new DataOutputStream(rd)
      ro.writeShort(4)
      Seq("systemid", "timeline", "xlogpos", "dbname").foreach { n =>
        cstr(rd, n); ro.writeInt(0); ro.writeShort(0); ro.writeInt(25)
        ro.writeShort(-1); ro.writeInt(-1); ro.writeShort(0)
      }
      writeBackend(out, 'T', rd.toByteArray)
      val dr = new ByteArrayOutputStream(); val dro = new DataOutputStream(dr)
      dro.writeShort(4)
      Seq("7272727272", "1", "0/1000", "events_db").foreach { v =>
        val b = v.getBytes(UTF_8); dro.writeInt(b.length); dro.write(b)
      }
      writeBackend(out, 'D', dr.toByteArray)
      val cc = new ByteArrayOutputStream(); cstr(cc, "IDENTIFY_SYSTEM")
      writeBackend(out, 'C', cc.toByteArray)
      writeBackend(out, 'Z', Array('I'.toByte))
      // START_REPLICATION
      sawStartReplication = readQuery()
      if (failSlot) {
        val e = new ByteArrayOutputStream()
        e.write('S'); cstr(e, "ERROR"); e.write('C'); cstr(e, "42704")
        e.write('M'); cstr(e, "replication slot \"ghost\" does not exist"); e.write(0)
        writeBackend(out, 'E', e.toByteArray); s.close(); done.countDown(); return
      }
      writeBackend(out, 'W', Array[Byte](0, 0, 0)) // CopyBoth, 0 cols
      // the stream: keepalive (reply requested) → read ack, then a real
      // Begin/Relation/Insert/Commit burst, then CopyDone
      def readAck(): PgOutput.StandbyStatusUpdate = {
        val tag = in.read(); assert(tag == 'd', s"expected CopyData ack got $tag")
        val l = in.readInt(); val b = new Array[Byte](l - 4); in.readFully(b)
        PgOutput.decodeStatusUpdate(b)
      }
      writeBackend(out, 'd', PgOutput.encodeKeepalive(
        PgOutput.PrimaryKeepalive(0x100L, 0L, replyRequested = true)))
      acks ::= readAck()
      val msgs = Seq[(Long, PgOutput.PgMsg)](
        0x200L -> PgOutput.BeginMsg(0x260L, 77000000L, 901),
        0x210L -> PgOutput.RelationMsg(PgOutput.EventsRelId, "public", "events",
          'd'.toByte, PgOutput.EventsRelCols),
        0x220L -> PgOutput.InsertMsg(PgOutput.EventsRelId,
          PgOutput.rowTuple(4001L, 1700000000000000000L, 7L, "click", 1.5, """{"k":"9"}""")),
        0x260L -> PgOutput.CommitMsg(0, 0x260L, 0x261L, 77000000L))
      msgs.foreach { case (lsn, m) =>
        writeBackend(out, 'd', xlogData(lsn, PgOutput.encode(m)))
        acks ::= readAck() // client acks every surfaced XLogData
      }
      writeBackend(out, 'c', Array.emptyByteArray) // CopyDone
      s.close(); done.countDown()
    }
    val thread = new Thread(() => serve())
    thread.setDaemon(true); thread.start()
  }

  test("full replication session: handshake, identify, stream, acks") {
    val srv = new FakeWalsender()
    val c = new PgReplicationClient("127.0.0.1", srv.port, "rep", "events_db")
    try {
      c.handshake()
      assert(srv.startupParams("replication") === "database")
      assert(srv.startupParams("user") === "rep")
      val id = c.identifySystem()
      assert(id.map(_.get) === Seq("7272727272", "1", "0/1000", "events_db"))
      c.startReplication("graft_slot", "graft_pub", PgWire.parseLsn("0/1000"))
      assert(srv.sawStartReplication.contains("START_REPLICATION SLOT \"graft_slot\""))
      assert(srv.sawStartReplication.contains("proto_version '1'"))
      assert(srv.sawStartReplication.contains("0/1000"))
      val got = c.poll(max = 100)
      assert(srv.done.await(5, TimeUnit.SECONDS))
      assert(got.map(_._1) === Seq(0x200L, 0x210L, 0x220L, 0x260L))
      assert(got.head._2 === PgOutput.BeginMsg(0x260L, 77000000L, 901))
      got(2)._2 match {
        case PgOutput.InsertMsg(relId, tuple) =>
          assert(relId === PgOutput.EventsRelId)
          assert(tuple.collect { case PgOutput.TextCol(b) => new String(b, UTF_8) }
            .contains("click"))
        case other => fail(s"expected InsertMsg, got $other")
      }
      assert(c.keepalivesSeen === 1L)
      // at-least-once cursor: the final ack covers the commit frame's end
      val finalAck = srv.acks.head
      assert(finalAck.flushedLsn >= 0x260L)
      // the keepalive-requested ack arrived BEFORE any data ack
      assert(srv.acks.last.flushedLsn === 0x100L)
    } finally c.close()
  }

  test("ErrorResponse surfaces sqlstate and the server's message") {
    val srv = new FakeWalsender(failSlot = true)
    val c = new PgReplicationClient("127.0.0.1", srv.port, "rep", "events_db")
    try {
      c.handshake(); c.identifySystem()
      val e = intercept[java.io.IOException](
        c.startReplication("ghost", "graft_pub", 0L))
      assert(e.getMessage.contains("42704"))
      assert(e.getMessage.contains("does not exist"))
    } finally c.close()
  }

  test("non-trust auth is refused loudly, not silently mishandled") {
    val srv = new FakeWalsender(authMd5 = true)
    val c = new PgReplicationClient("127.0.0.1", srv.port, "rep", "events_db")
    try {
      val e = intercept[Exception](c.handshake())
      assert(e.getMessage.contains("trust auth"))
    } finally c.close()
  }

  test("wireProbe dials the postgresql.connection address, both DSN forms") {
    val srv = new FakeWalsender()
    val id = graft.streaming.ConfigPipeline.wireProbe(Map(
      "postgresql.connection" -> s"host=127.0.0.1 port=${srv.port} user=rep dbname=events_db"))
    assert(id.map(_.get) === Seq("7272727272", "1", "0/1000", "events_db"))
    assert(srv.startupParams("user") === "rep")
    assert(srv.startupParams("database") === "events_db")
    val srv2 = new FakeWalsender()
    val id2 = graft.streaming.ConfigPipeline.wireProbe(Map(
      "postgresql.connection" -> s"postgres://rep@127.0.0.1:${srv2.port}/events_db"))
    assert(id2.map(_.get).head === "7272727272")
    // an unreachable walsender fails loudly before any pipeline state
    intercept[java.io.IOException] {
      graft.streaming.ConfigPipeline.wireProbe(Map(
        "postgresql.connection" -> s"host=127.0.0.1 port=1 user=rep"))
    }
  }

  test("tailer: socket frames spool to segments the executor decode replays") {
    val spark = SparkSpec.session
    val srv = new FakeWalsender()
    val dir = java.nio.file.Files.createTempDirectory("graft-wire-segments").toString
    val c = new PgReplicationClient("127.0.0.1", srv.port, "rep", "events_db")
    try {
      c.handshake(); c.identifySystem()
      c.startReplication("graft_slot", "graft_pub", 0L)
      // 4 frames at 3/segment → one full + one tail rotation
      val finalLsn = graft.sources.PgWireTailer.tail(spark, c, dir, framesPerSegment = 3)
      assert(finalLsn >= 0x260L)
      assert(srv.done.await(5, TimeUnit.SECONDS))
      val segs = spark.read.schema(PgOutput.frameSchema).parquet(dir)
      assert(segs.count() === 2L, "3+1 frames across two rotations")
      // the SAME executor-side decode the fixture path uses replays the
      // spooled wire bytes into typed WAL rows
      val wal = PgOutput.decodeSegments(segs).collect()
      val ins = wal.filter(_.op_wire == "I")
      assert(ins.length === 1)
      assert(ins.head.event_id === Some(4001L))
      assert(ins.head.event_type === Some("click"))
      assert(ins.head.user_id === Some(7L))
    } finally c.close()
  }

  test("tailer rotation replays the relation cache: 1-frame segments decode") {
    // the failure mode the bench caught: a rotation between Relation and
    // its DML orphans the insert from its schema — every segment must be
    // self-contained, so rotations re-emit the cached Relation frames
    val spark = SparkSpec.session
    val srv = new FakeWalsender()
    val dir = java.nio.file.Files.createTempDirectory("graft-wire-seg1").toString
    val c = new PgReplicationClient("127.0.0.1", srv.port, "rep", "events_db")
    try {
      c.handshake(); c.identifySystem()
      c.startReplication("graft_slot", "graft_pub", 0L)
      graft.sources.PgWireTailer.tail(spark, c, dir, framesPerSegment = 1)
      assert(srv.done.await(5, TimeUnit.SECONDS))
      val segs = spark.read.schema(PgOutput.frameSchema).parquet(dir)
      assert(segs.count() === 4L, "one segment per frame")
      val wal = PgOutput.decodeSegments(segs).collect()
      val ins = wal.filter(_.op_wire == "I")
      assert(ins.length === 1, "the isolated Insert segment decodes via the replayed Relation")
      assert(ins.head.event_id === Some(4001L))
    } finally c.close()
  }

  test("idle stream: proactive standby acks on the status cadence") {
    // PostgreSQL disconnects standbys silent past wal_sender_timeout —
    // with no inbound traffic the client must volunteer status updates
    // on its own timer (the reference's 5 s cadence)
    val server = new ServerSocket(0)
    @volatile var idleAcks = 0
    val done = new CountDownLatch(1)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      def backend(tag: Char, p: Array[Byte]): Unit = {
        out.writeByte(tag); out.writeInt(4 + p.length); out.write(p); out.flush()
      }
      val len = in.readInt(); in.readFully(new Array[Byte](len - 4))
      backend('R', ByteBuffer.allocate(4).putInt(0).array())
      backend('Z', Array('I'.toByte))
      val qt = in.read(); assert(qt == 'Q'); val ql = in.readInt()
      in.readFully(new Array[Byte](ql - 4))
      backend('W', Array[Byte](0, 0, 0))
      // stay SILENT for a fixed wall-clock window, counting the acks
      // that arrive purely from the client's timer (a per-read timeout
      // would never fire — each ack resets it)
      val deadline = System.nanoTime + 900e6.toLong
      s.setSoTimeout(200)
      while (System.nanoTime < deadline) {
        try {
          val tag = in.read(); if (tag < 0) throw new java.io.EOFException
          val l = in.readInt(); val b = new Array[Byte](l - 4); in.readFully(b)
          if (tag == 'd' && b(0) == 'r') idleAcks += 1
        } catch { case _: java.net.SocketTimeoutException => () }
      }
      backend('c', Array.emptyByteArray)
      s.close(); done.countDown()
    })
    t.setDaemon(true); t.start()
    val c = new PgReplicationClient("127.0.0.1", server.getLocalPort, "rep", "db",
      statusIntervalMs = 150)
    try {
      c.handshake()
      c.startReplication("s", "p", 0L)
      assert(c.poll(max = 10).isEmpty, "silent server ends with CopyDone, no frames")
      assert(done.await(5, TimeUnit.SECONDS))
      assert(idleAcks >= 3, s"expected timer-driven acks during ~900ms idle, got $idleAcks")
    } finally { c.close(); server.close() }
  }

  test("lsnText/parseLsn round-trip the X/Y hex form") {
    Seq(0L, 0x1000L, 0xABCDEF0012345678L, Long.MaxValue).foreach { l =>
      assert(PgWire.parseLsn(PgWire.lsnText(l)) === l)
    }
    assert(PgWire.lsnText(0x100000002L) === "1/2")
  }
}
