package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.cdc.PgOutput
import graft.cdc.PgOutput._
import graft.types.TypeRegistry
import graft.types.TypeRegistry.{PgTypeRow, Registration, Resolver}
import org.apache.spark.sql.types._

/** Lazy OID→converter resolution (`typemanager.go:236-323` analog):
  * enums, arrays, domains, composites resolve on first use through a
  * pg_type resolver; a column of a never-seen type appearing mid-stream
  * decodes without restart; unknown-to-everyone OIDs fail loudly. */
class TypeRegistrySpec extends SparkSpec {
  import spark.implicits._

  // user-defined types live at OID >= 16384; unique per test to keep the
  // shared JVM registry clean
  private val catalog: Resolver = Resolver.ofMap(Map(
    90001 -> PgTypeRow(90001, "mood", 'e', enumLabels = Seq("happy", "sad", "meh")),
    90002 -> PgTypeRow(90002, "_mood", 'a', elemOid = 90001),
    90003 -> PgTypeRow(90003, "age", 'd', baseOid = 23),
    90004 -> PgTypeRow(90004, "address", 'c'),
    90005 -> PgTypeRow(90005, "_int8_like", 'a', elemOid = 20),
    90010 -> PgTypeRow(90010, "shade", 'e', enumLabels = Seq("light", "dark"))))

  test("core OIDs parse text format to typed values") {
    assert(TypeRegistry.converterFor(20).parse("42") === 42L)
    assert(TypeRegistry.converterFor(16).parse("t") === true)
    assert(TypeRegistry.converterFor(701).parse("6.55") === 6.55)
    assert(TypeRegistry.converterFor(1114).parse("2024-01-01 00:00:07.179575000")
      === 1704067207179575000L)
    assert(TypeRegistry.converterFor(17).parse("\\x0aff").asInstanceOf[Array[Byte]].toSeq
      === Seq(0x0a.toByte, 0xff.toByte))
  }

  test("enum resolves lazily to label text and validates labels") {
    val r = TypeRegistry.converterFor(90001, catalog)
    assert(r.dataType === StringType)
    assert(r.parse("happy") === "happy")
    intercept[IllegalArgumentException] { r.parse("angry") }
    // second lookup hits the cache (no resolver needed anymore)
    assert(TypeRegistry.converterFor(90001).parse("sad") === "sad")
  }

  test("array type recurses to its element converter (enum + core)") {
    val enumArr = TypeRegistry.converterFor(90002, catalog)
    assert(enumArr.dataType === ArrayType(StringType))
    assert(enumArr.parse("{happy,sad}") === Seq("happy", "sad"))
    val longArr = TypeRegistry.converterFor(90005, catalog)
    assert(longArr.dataType === ArrayType(LongType))
    assert(longArr.parse("{1,2,NULL}") === Seq(1L, 2L, null))
  }

  test("array text literal handles quoting, escapes, NULL vs \"NULL\"") {
    val p = (s: String) => TypeRegistry.parseArrayText(s, x => x)
    assert(p("{}") === Nil)
    assert(p("{a,b}") === Seq("a", "b"))
    assert(p("""{"a,b","c\"d"}""") === Seq("a,b", "c\"d"))
    assert(p("""{NULL,"NULL"}""") === Seq(null, "NULL"))
  }

  test("domain resolves through its base type") {
    val r = TypeRegistry.converterFor(90003, catalog)
    assert(r.dataType === IntegerType)
    assert(r.parse("7") === 7)
  }

  test("composite passes through as record-literal text") {
    val r = TypeRegistry.converterFor(90004, catalog)
    assert(r.parse("(1,main st)") === "(1,main st)")
  }

  test("unknown OID with no resolver fails loudly") {
    val e = intercept[IllegalStateException] { TypeRegistry.converterFor(98765) }
    assert(e.getMessage.contains("98765"))
  }

  test("relation gains a column of a not-yet-registered type mid-stream: no restart") {
    // segment 1: two-column relation. segment 2 (later in the stream):
    // the relation re-announces with an extra enum column whose OID has
    // never been registered — decode proceeds, resolving it lazily.
    val relV1 = Seq(("id", 20), ("name", 25))
    val relV2 = relV1 :+ (("mood", 90010))
    val t1 = TypeRegistry.decodeTuple(relV1,
      Seq(TextCol("1".getBytes(UTF_8)), TextCol("a".getBytes(UTF_8))), catalog)
    assert(t1 === Seq("id" -> 1L, "name" -> "a"))
    val t2 = TypeRegistry.decodeTuple(relV2,
      Seq(TextCol("2".getBytes(UTF_8)), TextCol("b".getBytes(UTF_8)),
        TextCol("dark".getBytes(UTF_8))), catalog)
    assert(t2 === Seq("id" -> 2L, "name" -> "b", "mood" -> "dark"))
    // and the schema diff the evolution guard would report
    val diff = graft.streaming.SchemaEvolution.diff(
      TypeRegistry.schemaFor(relV1, catalog), TypeRegistry.schemaFor(relV2, catalog))
    assert(diff === Seq(graft.streaming.SchemaEvolution.Added("mood", StringType)))
  }

  test("pgoutput Type message registers the announced type for the decode path") {
    val oid = 91234
    assert(!TypeRegistry.known(oid))
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    writeFrame(o, 1L, PgOutput.encode(TypeMsg(oid, "public", "mytype")))
    PgOutput.decodeSegments(Seq((0L, 1L, bos.toByteArray))
      .toDF("segment", "start_lsn", "data")).collect()
    assert(TypeRegistry.known(oid), "Type message must register the oid")
    assert(TypeRegistry.converterFor(oid).parse("anything") === "anything")
  }

  test("binary-format tuples decode via the documented send-function forms") {
    import java.nio.ByteBuffer
    def be64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
    def be32(v: Int)  = ByteBuffer.allocate(4).putInt(v).array()
    val cols = Seq(("id", 20), ("n", 23), ("ok", 16), ("x", 701), ("ts", 1114), ("s", 25))
    val tsNanos = 1704067207179575000L
    val pgMicros = tsNanos / 1000 - PgOutput.PgEpochMicros
    val decoded = TypeRegistry.decodeTuple(cols, Seq(
      BinaryCol(be64(42L)), BinaryCol(be32(7)), BinaryCol(Array[Byte](1)),
      BinaryCol(ByteBuffer.allocate(8).putDouble(6.55).array()),
      BinaryCol(be64(pgMicros)), BinaryCol("hi".getBytes(UTF_8))))
    assert(decoded === Seq("id" -> 42L, "n" -> 7, "ok" -> true,
      "x" -> 6.55, "ts" -> tsNanos, "s" -> "hi"))
    // a type with no binary codec refuses rather than misreading bytes
    val e = intercept[IllegalArgumentException] {
      TypeRegistry.decodeTuple(Seq(("j", 114)), Seq(BinaryCol(be32(1))))
    }
    assert(e.getMessage.contains("no binary codec"))
    // mixed text+binary in ONE tuple (the protocol allows per-column kinds)
    assert(TypeRegistry.decodeTuple(Seq(("a", 20), ("b", 20)),
      Seq(TextCol("5".getBytes(UTF_8)), BinaryCol(be64(6L))))
      === Seq("a" -> 5L, "b" -> 6L))
  }

  test("domain types keep their base type's BINARY codec") {
    // PG sends domain values via the base send function; a domain over
    // int8 must decode 8 network-order bytes, not reject binary mode
    val dom = TypeRegistry.converterFor(90013, Resolver.ofMap(Map(
      90013 -> PgTypeRow(90013, "order_id", 'd', baseOid = 20))))
    assert(dom.parseBinary != null, "domain must inherit base parseBinary")
    val b = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
    assert(dom.parseBinary(b) === 42L)
  }

  test("tuple arity mismatch against the relation fails loudly, never truncates") {
    val cols = Seq(("a", 20), ("b", 20), ("c", 20))
    val short = Seq(TextCol("1".getBytes(UTF_8)), TextCol("2".getBytes(UTF_8)))
    val e = intercept[IllegalArgumentException] {
      TypeRegistry.decodeTuple(cols, short, catalog)
    }
    assert(e.getMessage.contains("arity 2 != relation arity 3"))
  }

  test("array literal hardening: multidimensional and trailing-backslash fail loudly") {
    intercept[IllegalArgumentException] {
      TypeRegistry.parseArrayText("{{1,2},{3,4}}", _.toString.toLong)
    }
    intercept[IllegalArgumentException] {
      TypeRegistry.parseArrayText("{\"a\\", s => s)
    }
  }

  test("null decodes to a null-valued key; TOAST-unchanged omits the key entirely") {
    // decoderplan.go:54-59 — 'n' sets the key to nil, 'u' never touches
    // the map: the distinction is observable in the envelope ("blob": null
    // vs no "blob" key) and must survive decode
    val cols = Seq(("id", 20), ("blob", 25))
    assert(TypeRegistry.decodeTuple(cols, Seq(NullCol, UnchangedCol), catalog)
      === Seq("id" -> null))
    assert(TypeRegistry.decodeTuple(cols, Seq(UnchangedCol, UnchangedCol), catalog)
      === Seq.empty)
  }

  test("pg_type bulk load over JDBC: enum/domain/composite/array resolve, hash-equal to the file path") {
    // the reference loads ALL of pg_type in one side-channel query at
    // startup (queries.go:36-63 / typemanager.go:111-138); here the
    // same rows come off a JDBC-served pg_type table and must resolve
    // IDENTICALLY to the fixture-map path
    import graft.sources.JdbcSideChannel
    val url = "jdbc:derby:memory:graft_pgtype;create=true"
    JdbcSideChannel.withConnection(url) { c =>
      val st = c.createStatement()
      try st.execute("DROP TABLE PG_TYPE") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE PG_TYPE (oid INT NOT NULL PRIMARY KEY, " +
        "typname VARCHAR(64), typtype CHAR(1), typelem INT, " +
        "typbasetype INT, enum_values VARCHAR(256))")
      Seq(
        "(93001, 'mood_j', 'e', 0, 0, '{happy,sad,meh}')", // PG array-literal labels
        "(93002, '_mood_j', 'a', 93001, 0, NULL)",
        "(93003, 'age_j', 'd', 0, 20, NULL)", // domain over int8
        "(93004, 'address_j', 'c', 0, 0, NULL)",
        "(93010, 'shade_j', 'e', 0, 0, 'light,dark')" // comma-joined labels
      ).foreach(v => st.execute(s"INSERT INTO PG_TYPE VALUES $v"))
    }
    val jdbc = JdbcSideChannel.pgTypeResolver(url,
      "SELECT oid, typname, typtype, typelem, typbasetype, enum_values FROM PG_TYPE")
    // enum: labels parsed from the array-literal aggregation
    val mood = TypeRegistry.converterFor(93001, jdbc)
    assert(mood.dataType === StringType && mood.parse("happy") === "happy")
    intercept[IllegalArgumentException] { mood.parse("angry") }
    // comma-joined label form (a non-PG catalog serving the same shape)
    assert(TypeRegistry.converterFor(93010, jdbc).parse("dark") === "dark")
    // array recurses to the enum element; domain picks up int8's parser
    // AND binary codec; composite passes record-literal text through
    assert(TypeRegistry.converterFor(93002, jdbc).parse("{happy,sad}")
      === Seq("happy", "sad"))
    val age = TypeRegistry.converterFor(93003, jdbc)
    assert(age.dataType === LongType && age.parse("42") === 42L)
    assert(age.parseBinary(java.nio.ByteBuffer.allocate(8).putLong(7L).array()) === 7L)
    assert(TypeRegistry.converterFor(93004, jdbc).parse("(1,main st)") === "(1,main st)")
    // envelope parity: a tuple decoded through the JDBC-loaded resolver
    // is byte-identical to the fixture-map path with the same rows
    val fileRes = Resolver.ofMap(Map(
      94001 -> PgTypeRow(94001, "mood_f", 'e', enumLabels = Seq("happy", "sad", "meh")),
      94003 -> PgTypeRow(94003, "age_f", 'd', baseOid = 20)))
    val colsJ = Seq(("id", 20), ("m", 93001), ("a", 93003))
    val colsF = Seq(("id", 20), ("m", 94001), ("a", 94003))
    val tuple = Seq(TextCol("5".getBytes(UTF_8)), TextCol("sad".getBytes(UTF_8)),
      TextCol("33".getBytes(UTF_8)))
    assert(TypeRegistry.decodeTuple(colsJ, tuple, jdbc)
      === TypeRegistry.decodeTuple(colsF, tuple, fileRes))
  }

  test("resolver rides the decode closure: a resolver-only enum column decodes from segments") {
    // the startup-loaded pg_type map must reach the EXECUTOR-side
    // flatMap (typemanager.go:111-138's initialize, distributed): a
    // relation whose column oid only the resolver knows decodes with
    // it, and fails loudly without it
    import graft.cdc.PgOutput.{RelCol, RelationMsg, InsertMsg, rowTuple, writeFrame, encode}
    val cols = Seq(RelCol(1, "event_id", 20, -1), RelCol(0, "ts", 1114, -1),
      RelCol(0, "user_id", 20, -1), RelCol(0, "event_type", 95101, -1), // resolver-only enum
      RelCol(0, "value", 701, -1), RelCol(0, "props", 25, -1))
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    writeFrame(o, 0x10L, encode(RelationMsg(778, "public", "events", 'd'.toByte, cols)))
    writeFrame(o, 0x20L, encode(InsertMsg(778,
      rowTuple(9001L, 1700000000000000000L, 7L, "happy", 1.0, "{}"))))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L, 0x10L, bos.toByteArray)),
      PgOutput.frameSchema)
    // no resolver: the unknown oid is a hard error, not a silent null
    val e = intercept[Exception] { PgOutput.decodeSegments(df).collect() }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("unknown to registry"), chain.take(300))
    val res = Resolver.ofMap(Map(95101 -> PgTypeRow(95101, "evt_kind", 'e',
      enumLabels = Seq("happy", "sad"))))
    val rows = PgOutput.decodeSegments(df, res).collect()
    assert(rows.length === 1 && rows.head.event_type === Some("happy"))
  }
}
