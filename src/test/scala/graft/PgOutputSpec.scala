package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.cdc.PgOutput
import graft.cdc.PgOutput._
import org.apache.spark.sql.functions._

/** Byte-level tests for the binary pgoutput codec (golden frames
  * hand-built from the public protocol layout), roundtrip coverage for
  * every message type, and the segment decode end-to-end — batch and
  * streaming. */
class PgOutputSpec extends SparkSpec {
  import spark.implicits._

  // ---- golden bytes: hand-assembled per the protocol docs ----

  test("Begin message matches the documented byte layout exactly") {
    // 'B', Int64 finalLsn, Int64 commitTime (micros since 2000-01-01), Int32 xid
    val m = BeginMsg(finalLsn = 0x0102030405060708L, commitTimeMicros = 1000L, xid = 42)
    val expected = Array[Byte]('B',
      0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08,
      0, 0, 0, 0, 0, 0, 0x03, 0xE8.toByte,
      0, 0, 0, 42)
    assert(PgOutput.encode(m).toSeq === expected.toSeq)
    assert(PgOutput.decode(expected) === m)
  }

  test("Relation message: cstrings, replica identity, column array") {
    val m = RelationMsg(7, "public", "t", 'f', Seq(RelCol(1, "id", 20, -1)))
    val bytes = PgOutput.encode(m)
    // 'R' + relId(4) + "public\0"(7) + "t\0"(2) + 'f'(1) + ncols(2)
    //   + [flags(1) + "id\0"(3) + oid(4) + typmod(4)]
    assert(bytes.length === 1 + 4 + 7 + 2 + 1 + 2 + (1 + 3 + 4 + 4))
    assert(bytes(0) === 'R'.toByte)
    assert(new String(bytes.slice(5, 11), UTF_8) === "public")
    assert(bytes(11) === 0.toByte)           // NUL terminator
    assert(PgOutput.decode(bytes) === m)
  }

  test("Insert with text tuple: 'N' marker, per-column kind + length prefix") {
    val m = InsertMsg(7, Seq(TextCol("99".getBytes(UTF_8)), NullCol, UnchangedCol))
    val bytes = PgOutput.encode(m)
    assert(bytes(0) === 'I'.toByte)
    assert(bytes(5) === 'N'.toByte)
    assert((bytes(6) << 8 | bytes(7)) === 3)  // ncols
    assert(bytes(8) === 't'.toByte)
    assert(java.nio.ByteBuffer.wrap(bytes, 9, 4).getInt === 2) // len("99")
    assert(bytes(15) === 'n'.toByte)
    assert(bytes(16) === 'u'.toByte)
    PgOutput.decode(bytes) match {
      case InsertMsg(7, Seq(TextCol(b), NullCol, UnchangedCol)) =>
        assert(new String(b, UTF_8) === "99")
      case other => fail(s"bad decode: $other")
    }
  }

  test("every message type round-trips byte-exactly") {
    val tuple = Seq(TextCol("x".getBytes(UTF_8)), NullCol)
    val msgs: Seq[PgMsg] = Seq(
      BeginMsg(123L, 456L, 7),
      CommitMsg(0, 123L, 124L, 456L),
      OriginMsg(99L, "origin-a"),
      RelationMsg(16385, "public", "events", 'f', EventsRelCols),
      TypeMsg(3614, "pg_catalog", "tsvector"),
      InsertMsg(16385, tuple),
      UpdateMsg(16385, Some('O'), Some(tuple), tuple),
      UpdateMsg(16385, Some('K'), Some(Seq(TextCol("1".getBytes(UTF_8)))), tuple),
      UpdateMsg(16385, None, None, tuple),
      DeleteMsg(16385, 'K', Seq(TextCol("1".getBytes(UTF_8)))),
      DeleteMsg(16385, 'O', tuple),
      TruncateMsg(1, Seq(16385, 16386)),
      LogicalMsg(transactional = true, 55L, "graft.props", "{\"k\":1}".getBytes(UTF_8)),
      LogicalMsg(transactional = false, 56L, "p", Array.emptyByteArray))
    msgs.foreach { m =>
      val enc = PgOutput.encode(m)
      val dec = PgOutput.decode(enc)
      // Array[Byte] fields break case-class equality; compare re-encoded bytes
      assert(PgOutput.encode(dec).toSeq === enc.toSeq, s"roundtrip mismatch for $m")
      assert(dec.getClass === m.getClass)
    }
  }

  test("timestamp text codec is exact at nano precision, pre-1970 included") {
    val cases = Seq(0L, 1L, 999999999L, 1704067207179575000L, -1L, -1000000000L,
      253402300799999999L * 1000)
    cases.foreach { n => assert(tsFromText(tsToText(n)) === n, s"nanos $n") }
    assert(tsToText(1704067207179575000L) === "2024-01-01 00:00:07.179575000")
  }

  test("frame framing rejects corrupt length prefixes before allocating") {
    // hostile/bit-rotted prefix claiming 2 GB must fail loudly, not
    // attempt the allocation; a truncated blob must not AIOOBE
    def blobWith(len: Int, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(len); o.write(body)
      bos.toByteArray
    }
    val giant = blobWith(Int.MaxValue, Array[Byte]('w', 0, 0, 0))
    val e1 = intercept[IllegalArgumentException] {
      PgOutput.readFrames(giant).toSeq
    }
    assert(e1.getMessage.contains("exceeds remaining"))
    val truncated = Array[Byte](0, 0) // 2 bytes: not even a header
    val e2 = intercept[IllegalArgumentException] {
      PgOutput.readFrames(truncated).toSeq
    }
    assert(e2.getMessage.contains("truncated frame header"))
    val negative = blobWith(-10, Array[Byte]('w', 0, 0, 0, 0))
    intercept[IllegalArgumentException] { PgOutput.readFrames(negative).toSeq }
  }

  test("decode fails loudly on an unknown relation id and bad markers") {
    // Spark wraps the executor-side IllegalStateException; assert on the cause chain
    val e = intercept[Exception] {
      PgOutput.decodeSegments(
        Seq((0L, 0L, {
          val bos = new java.io.ByteArrayOutputStream()
          val o = new java.io.DataOutputStream(bos)
          writeFrame(o, 1L, PgOutput.encode(InsertMsg(999, Seq(TextCol("1".getBytes(UTF_8))))))
          bos.toByteArray
        })).toDF("segment", "start_lsn", "data")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unknown relation id 999")))
    intercept[IllegalArgumentException] { PgOutput.decode(Array[Byte]('Z', 0, 0)) }
  }

  test("segment decode reproduces shapeWal rows on sf0.001 (DML) and message rows") {
    val ev = Tables.events(spark, sf001)
    val decoded = PgOutput.decodeSegments(PgOutput.encodeSegments(ev)).cache()
    val dml = decoded.filter(r => r.op_wire != "M")
    // every DML row carries the full tuple, bit-exact after text roundtrip
    val mismatch = dml.toDF().alias("d")
      .join(ev.alias("e"), col("d.event_id") === col("e.event_id"))
      .filter(col("d.lsn") =!= col("e.event_id") ||
        col("d.ts") =!= col("e.ts") || col("d.user_id") =!= col("e.user_id") ||
        col("d.event_type") =!= col("e.event_type") ||
        col("d.value") =!= col("e.value") || col("d.props") =!= col("e.props") ||
        col("d.xid") =!= expr("e.event_id div 10"))
    assert(mismatch.count() === 0)
    val nEvents = ev.count()
    assert(decoded.count() === nEvents, "one decoded row per source event")
    // message rows: xid attached from the surrounding Begin (transactional)
    val msgs = decoded.filter(r => r.op_wire == "M")
    assert(msgs.filter(r => r.xid < 0).count() === 0, "transactional messages must carry xid")
    assert(msgs.count() === ev.filter(col("event_type") === "click").count())
    decoded.unpersist()
  }

  test("relation evolves mid-stream: new column of a Type-announced type, no restart") {
    // the VERDICT-4 end state: a relation re-announces with an extra
    // column whose type is registered by a Type message moments before —
    // rows decode correctly on BOTH sides of the evolution, in one
    // uninterrupted segment stream
    val moodOid = 93456
    val relV1 = RelationMsg(9, "public", "users", 'f', Seq(
      RelCol(1, "event_id", 20, -1), RelCol(0, "event_type", 25, -1)))
    val relV2 = RelationMsg(9, "public", "users", 'f',
      relV1.cols :+ RelCol(0, "props", moodOid, -1))
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    writeFrame(o, 1L, PgOutput.encode(relV1))
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(3L, 0L, 1)))
    writeFrame(o, 3L, PgOutput.encode(InsertMsg(9,
      Seq(TextCol("1".getBytes(UTF_8)), TextCol("signup".getBytes(UTF_8))))))
    writeFrame(o, 4L, PgOutput.encode(CommitMsg(0, 3L, 4L, 0L)))
    // DDL lands: the stream announces the new type, then the new shape
    writeFrame(o, 5L, PgOutput.encode(TypeMsg(moodOid, "public", "mood2")))
    writeFrame(o, 6L, PgOutput.encode(relV2))
    writeFrame(o, 7L, PgOutput.encode(BeginMsg(8L, 0L, 2)))
    writeFrame(o, 8L, PgOutput.encode(InsertMsg(9,
      Seq(TextCol("2".getBytes(UTF_8)), TextCol("signup".getBytes(UTF_8)),
        TextCol("happy".getBytes(UTF_8))))))
    writeFrame(o, 9L, PgOutput.encode(CommitMsg(0, 8L, 9L, 0L)))
    val rows = PgOutput.decodeSegments(
      Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data"))
      .collect().sortBy(_.lsn)
    assert(rows.length === 2)
    assert(rows(0).event_id === Some(1L) && rows(0).props === None)
    assert(rows(1).event_id === Some(2L) && rows(1).props === Some("happy"),
      "post-evolution row must decode the new column through the announced type")
    assert(rows(1).xid === 2L)
  }

  test("truncate decode emits one row per relation with resolved names") {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    writeFrame(o, 1L, PgOutput.encode(RelationMsg(5, "public", "a", 'd', Seq(RelCol(1, "id", 20, -1)))))
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(9L, 0L, 3)))
    writeFrame(o, 3L, PgOutput.encode(TruncateMsg(1, Seq(5, 6))))
    writeFrame(o, 4L, PgOutput.encode(CommitMsg(0, 9L, 10L, 0L)))
    val rows = PgOutput.decodeSegments(
      Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data"))
      .collect().sortBy(_.lsn)
    assert(rows.length === 2)
    assert(rows.forall(_.op_wire == "T"))
    assert(rows(0).table_name === Some("a"))
    assert(rows(1).table_name === None) // relation 6 never announced
    assert(rows.forall(_.xid == 3L))
  }

  test("codec survives hostile inputs: giant length prefixes, truncation, NULs, fuzz") {
    // a corrupt length prefix must refuse BEFORE allocating, not OOM
    val giant = Array[Byte]('I', 0, 0, 0, 7, 'N', 0, 1, 't', 0x7f, -1, -1, -1)
    val e = intercept[IllegalArgumentException] { PgOutput.decode(giant) }
    assert(e.getMessage.contains("length prefix"))
    // embedded NUL in a cstring would desync the wire — encode refuses
    intercept[IllegalArgumentException] {
      PgOutput.encode(OriginMsg(1L, "a b"))
    }
    // truncated frames and random bytes: always a loud exception (any
    // kind), never a hang or a silent wrong decode
    val valid = PgOutput.encode(RelationMsg(7, "public", "t", 'f',
      Seq(RelCol(1, "id", 20, -1))))
    (1 until valid.length).foreach { cut =>
      intercept[Exception] { PgOutput.decode(valid.take(cut)) }
    }
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val junk = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt().toByte)
      try { PgOutput.decode(junk); () } catch { case _: Exception => () }
    }
    // unicode survives the cstring codec byte-exactly
    val uni = RelationMsg(7, "schéma", "таблица", 'f', Seq(RelCol(0, "日本語", 25, -1)))
    assert(PgOutput.decode(PgOutput.encode(uni)) === uni)
  }

  test("keepalive/status-update control frames: layout, roundtrip, decoder skip") {
    // PrimaryKeepalive: 'k', Int64 walEnd, Int64 serverTime, Byte reply
    val ka = PrimaryKeepalive(0x1122334455667788L, 99L, replyRequested = true)
    val kb = PgOutput.encodeKeepalive(ka)
    assert(kb.length === 18 && kb(0) === 'k'.toByte && kb(17) === 1.toByte)
    assert(PgOutput.decodeKeepalive(kb) === ka)
    // StandbyStatusUpdate: 'r', 4×Int64, Byte
    val st = StandbyStatusUpdate(10L, 9L, 8L, 1234L, replyRequested = false)
    val sb2 = PgOutput.encodeStatusUpdate(st)
    assert(sb2.length === 34 && sb2(0) === 'r'.toByte)
    assert(PgOutput.decodeStatusUpdate(sb2) === st)
    // keepalives interleaved in a segment byte stream are skipped — at
    // the head, between frames, and trailing
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    PgOutput.writeKeepaliveFrame(o, ka)
    writeFrame(o, 1L, PgOutput.encode(RelationMsg(5, "public", "a", 'f',
      Seq(RelCol(1, "id", 20, -1)))))
    PgOutput.writeKeepaliveFrame(o, ka)
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(3L, 0L, 1)))
    writeFrame(o, 3L, PgOutput.encode(InsertMsg(5, Seq(TextCol("7".getBytes(UTF_8))))))
    writeFrame(o, 4L, PgOutput.encode(CommitMsg(0, 3L, 4L, 0L)))
    PgOutput.writeKeepaliveFrame(o, ka)
    val rows = PgOutput.decodeSegments(
      Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data")).collect()
    assert(rows.length === 1)
    assert(rows(0).lsn === 3L && rows(0).op_wire === "I" && rows(0).xid === 1L)
  }

  test("decode is partitioning-invariant (segments are self-contained)") {
    val frames = PgOutput.encodeSegments(Tables.events(spark, sf001)).cache()
    def rows(parts: Int) = PgOutput.decodeSegments(frames.repartition(parts))
      .collect().map(r => (r.lsn, r.op_wire, r.event_id, r.xid)).toSet
    val one = rows(1)
    assert(one === rows(7) && one === rows(32),
      "decoded set must not depend on how segments land on partitions")
    frames.unpersist()
  }

  test("empty transaction (Begin+Commit only) decodes to zero rows, no error") {
    // reference parity: Test_General_Acknowledge_To_PG_With_Only_Begin_Commit
    // (`tests/streamer_test.go`) — keepalive-style empty txns must flow
    // through without producing events or corrupting xid state
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    writeFrame(o, 1L, PgOutput.encode(RelationMsg(5, "public", "a", 'f',
      Seq(RelCol(1, "id", 20, -1)))))
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(2L, 0L, 9)))
    writeFrame(o, 3L, PgOutput.encode(CommitMsg(0, 2L, 3L, 0L)))
    writeFrame(o, 4L, PgOutput.encode(BeginMsg(5L, 0L, 10)))
    writeFrame(o, 5L, PgOutput.encode(InsertMsg(5, Seq(TextCol("1".getBytes(UTF_8))))))
    writeFrame(o, 6L, PgOutput.encode(CommitMsg(0, 5L, 6L, 0L)))
    val rows = PgOutput.decodeSegments(
      Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data")).collect()
    assert(rows.length === 1)
    assert(rows(0).xid === 10L, "xid must come from the SECOND txn, not the empty one")
  }

  test("unchanged-TOAST 'u' omits the envelope key; 'n' renders null — and binary mode agrees") {
    // decoderplan.go:54-59 — the observable difference between a column
    // PG never read ('u') and one that IS null ('n') must survive the
    // full encode → decode → render → re-parse chain
    val gate = PgOutput.toastGate(spark, sf001, toastEvery = 3).collect()
    assert(gate.nonEmpty)
    val byId = gate.map(r => r.getLong(3) -> (r.getBoolean(1), r.getString(2))).toMap
    val evs = Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("props")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.keySet === evs.keySet)
    var omitted = 0
    evs.foreach { case (eid, props) =>
      val (keyPresent, parsed) = byId(eid)
      if (props != null && eid % 3 == 0) {
        assert(!keyPresent, s"event $eid: elided props must have NO key")
        assert(parsed == null); omitted += 1
      } else {
        assert(keyPresent, s"event $eid: untouched props must keep its key")
        assert(parsed === props)
      }
    }
    assert(omitted > 0, "fixture must exercise the elision branch")
    // binary tuple format takes a different wire path to the same rows
    val bin = PgOutput.toastGate(spark, sf001, toastEvery = 3, binary = true)
      .collect().map(r => r.getLong(3) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(bin === byId)
  }

  test("update old tuples decode into before_*: 'O' full row, 'K' key columns only") {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def t(s: String) = TextCol(s.getBytes(UTF_8))
    val newTup = Seq(t("1"), t("2024-01-01 00:00:00.000000000"), t("5"), t("purchase"), t("2.5"), t("{}"))
    val oldFull = Seq(t("1"), t("2024-01-01 00:00:00.000000000"), t("4"), t("purchase"), t("1.5"), t("{\"old\":1}"))
    // 'K': identity-index columns only — non-key columns ride as null
    val oldKey = Seq(t("1"), NullCol, NullCol, NullCol, NullCol, NullCol)
    writeFrame(o, 1L, PgOutput.encode(RelationMsg(PgOutput.EventsRelId,
      "public", "events", 'f', PgOutput.EventsRelCols)))
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(4L, 0L, 7)))
    writeFrame(o, 3L, PgOutput.encode(
      UpdateMsg(PgOutput.EventsRelId, Some('O'), Some(oldFull), newTup)))
    writeFrame(o, 4L, PgOutput.encode(
      UpdateMsg(PgOutput.EventsRelId, Some('K'), Some(oldKey), newTup)))
    writeFrame(o, 5L, PgOutput.encode(
      UpdateMsg(PgOutput.EventsRelId, None, None, newTup)))
    writeFrame(o, 6L, PgOutput.encode(CommitMsg(0, 4L, 7L, 0L)))
    val rows = PgOutput.decodeSegments(
        Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data"))
      .collect().sortBy(_.lsn)
    assert(rows.length === 3)
    val full = rows(0)
    assert(full.old_kind === Some("O"))
    assert(full.before_user_id === Some(4L) && full.before_value === Some(1.5)
      && full.before_props === Some("{\"old\":1}"))
    assert(full.user_id === Some(5L), "main columns must stay the NEW tuple")
    val key = rows(1)
    assert(key.old_kind === Some("K"))
    assert(key.before_event_id === Some(1L))
    assert(key.before_user_id === None && key.before_props === None,
      "'K' carries identity columns only — the rest never reached the wire")
    val none = rows(2)
    assert(none.old_kind === None && none.before_event_id === None)
  }

  test("wire-path envelope renders before:null for updates with NO old tuple") {
    // REPLICA IDENTITY DEFAULT: the wire carries no old row, and the
    // envelope must say "before":null — an all-null OBJECT would read
    // as a known all-null old row and corrupt a consumer's replica
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def t(s: String) = TextCol(s.getBytes(UTF_8))
    val newTup = Seq(t("1"), t("2024-01-01 00:00:00.000000000"), t("5"),
      t("purchase"), t("2.5"), t("{}"))
    writeFrame(o, 1L, PgOutput.encode(RelationMsg(PgOutput.EventsRelId,
      "public", "events", 'f', PgOutput.EventsRelCols)))
    writeFrame(o, 2L, PgOutput.encode(BeginMsg(4L, 0L, 7)))
    writeFrame(o, 3L, PgOutput.encode(
      UpdateMsg(PgOutput.EventsRelId, None, None, newTup)))
    writeFrame(o, 4L, PgOutput.encode(
      UpdateMsg(PgOutput.EventsRelId, Some('O'), Some(newTup), newTup)))
    writeFrame(o, 5L, PgOutput.encode(CommitMsg(0, 4L, 6L, 0L)))
    val envs = PgOutput.decodeSegments(
        Seq((0L, 1L, bos.toByteArray)).toDF("segment", "start_lsn", "data"))
      .toDF().select(col("lsn"), PgOutput.wireEnvelopeCol().as("env"))
      .collect().sortBy(_.getLong(0)).map(_.getString(1))
    assert(envs(0).contains("\"before\":null"),
      s"no-old-tuple update must render before:null, got: ${envs(0)}")
    assert(envs(1).contains("\"before\":{"),
      s"RI FULL update must render the before object, got: ${envs(1)}")
  }

  test("wire-path envelope: binary tuple format renders identical rows to text") {
    val text = PgOutput.envelopeGate(spark, sf001, toastEvery = 3).collect()
    val bin = PgOutput.envelopeGate(spark, sf001, toastEvery = 3, binary = true).collect()
    assert(text.nonEmpty)
    assert(text.map(_.toSeq).toSeq === bin.map(_.toSeq).toSeq)
    // spot the asymmetry the gate exists for: an elided update keeps
    // before.props but drops the after key
    val elided = text.filter(r => !r.isNullAt(2) && !r.getBoolean(2) && r.getString(1) == "u")
    assert(elided.nonEmpty)
    elided.foreach(r => assert(r.getString(5) != null,
      s"lsn ${r.getLong(0)}: before.props must survive when after elides"))
  }

  test("streaming decode over segment files equals the batch decode") {
    val dir = java.nio.file.Files.createTempDirectory("pgo_stream").toString
    val ev = Tables.events(spark, sf001)
    PgOutput.encodeSegments(ev).write.mode("overwrite").parquet(s"$dir/segments")
    val out = PgOutput.streamDecoded(spark, s"$dir/segments")
    val q = out.writeStream.format("memory").queryName("pgo_decoded")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT lsn, op_wire FROM pgo_decoded")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = PgOutput.decodeSegments(PgOutput.encodeSegments(ev))
      .select(col("lsn"), col("op_wire"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }
}
