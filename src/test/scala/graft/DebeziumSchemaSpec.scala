package graft

import graft.model.DebeziumSchema
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Field-by-field shape assertions for the Debezium `{schema, payload}`
  * descriptor against the reference's consumer-side model
  * (`testsupport/model.go:24-77`) and builder semantics
  * (`spi/schema/schemabuilder.go:413-474`, `eventschema.go:180-324`). */
class DebeziumSchemaSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def parse(s: String): JsonNode = mapper.readTree(s)
  private def fieldNames(n: JsonNode): Seq[String] =
    n.get("fields").elements().asScala.map(_.get("field").asText()).toSeq

  test("envelope schema has the reference's field list in order") {
    val env = parse(graft.cdc.Cdc.eventsEnvelopeSchemaJson)
    assert(env.get("type").asText() === "struct")
    assert(env.get("name").asText() === "graft.public.events.Envelope")
    assert(fieldNames(env) === Seq("before", "after", "source", "op", "tsdb_op", "ts_ms"))
    // builder semantics: required → "optional" omitted entirely
    assert(!env.has("optional"))
    // builder-built op/tsdb_op/ts_ms (String()/Int64()): Build omits the
    // optional key when false — for all three, unlike literal elements
    env.get("fields").elements().asScala
      .filter(f => Set("op", "tsdb_op", "ts_ms").contains(f.get("field").asText()))
      .foreach(f => assert(!f.has("optional"), f.toString))
  }

  test("op='m' envelope uses MessageValueSchema, not the table envelope (eventschema.go:287-340)") {
    val env = parse(graft.cdc.Cdc.messageEnvelopeSchemaJson)
    assert(env.get("type").asText() === "struct")
    assert(env.get("name").asText() === "graft.message.Envelope")
    // literal struct: optional:false present at top level
    assert(env.get("optional").asBoolean() === false)
    val fields = env.get("fields").elements().asScala.toSeq
    // MessageValueSchema first: version 1, message block, no before/after
    val mv = fields.head
    assert(mv.get("version").asInt() === 1)
    assert(mv.get("name").asText() === DebeziumSchema.MessageValueSchemaName)
    val mvFields = mv.get("fields").elements().asScala.toSeq
    assert(!mvFields.exists(f => f.has("field") &&
      Set("before", "after").contains(f.get("field").asText())))
    val msgBlock = mvFields.find(f => f.has("field") &&
      f.get("field").asText() == "message").get
    assert(msgBlock.get("message").get("name").asText() === DebeziumSchema.MessageBlockSchemaName)
    assert(msgBlock.get("message").get("version").asInt() === 1)
    // simpleSchemaElement literals: optional ALWAYS present
    val tsdb = fields.find(f => f.has("field") && f.get("field").asText() == "tsdb_op").get
    assert(tsdb.get("optional").asBoolean() === true)
    val op = fields.find(f => f.has("field") && f.get("field").asText() == "op").get
    assert(op.get("optional").asBoolean() === false)
  }

  test("before/after carry the row schema as {topic}.Value with column indices") {
    val env = parse(graft.cdc.Cdc.eventsEnvelopeSchemaJson)
    val fields = env.get("fields").elements().asScala.toSeq
    for (name <- Seq("before", "after")) {
      val f = fields.find(_.get("field").asText() == name).get
      assert(f.get("type").asText() === "struct")
      assert(f.get("name").asText() === "graft.public.events.Value")
      val cols = f.get("fields").elements().asScala.toSeq
      assert(cols.map(_.get("field").asText()) ===
        Seq("event_id", "props", "user_id", "value_cents"))
      assert(cols.map(_.get("index").asInt()) === Seq(0, 1, 2, 3))
      val props = cols(1)
      assert(props.get("name").asText() === "io.debezium.data.Json")
      assert(props.get("optional").asBoolean())
      assert(cols.head.get("type").asText() === "int64")
    }
  }

  test("source schema matches eventschema.go:304-323 incl. the ts_ms STRING quirk") {
    val env = parse(graft.cdc.Cdc.eventsEnvelopeSchemaJson)
    val src = env.get("fields").elements().asScala
      .find(_.get("field").asText() == "source").get
    assert(src.get("name").asText() === "io.debezium.connector.postgresql.Source")
    val byName = src.get("fields").elements().asScala
      .map(f => f.get("field").asText() -> f).toMap
    assert(byName.keySet === Set("version", "connector", "name", "ts_ms",
      "snapshot", "schema", "table", "txId", "lsn", "xmin"))
    assert(byName("ts_ms").get("type").asText() === "string") // reference quirk
    assert(byName("snapshot").get("default").asBoolean() === false)
    assert(byName("txId").get("type").asText() === "int64")
  }

  test("PK key schema uses keySchemaElement nesting (eventschema.go:228-252)") {
    val key = parse(graft.cdc.Cdc.eventsPkKeySchemaJson)
    assert(key.get("name").asText() === "graft.public.events.Key")
    assert(key.get("optional").asBoolean() === false) // literal struct: present
    val el = key.get("fields").get(0)
    assert(el.get("name").asText() === "event_id")
    assert(el.get("index").asInt() === 0)
    assert(el.get("schema").get("type").asText() === "int64")
    assert(el.get("schema").get("optional").asBoolean() === false)
  }

  test("message and timescale key schemas (eventschema.go:254-264,342-351)") {
    val mk = parse(DebeziumSchema.messageKeySchemaJson)
    assert(mk.get("version").asInt() === 1)
    assert(mk.get("name").asText() === "io.debezium.connector.postgresql.MessageKey")
    assert(mk.get("fields").get(0).get("field").asText() === "prefix")
    assert(mk.get("fields").get(0).get("optional").asBoolean())
    val tk = parse(DebeziumSchema.timescaleKeySchemaJson)
    assert(tk.get("name").asText() === "com.timescale.Event")
    assert(fieldNames(tk) === Seq("schema", "table"))
  }

  test("array and map descriptors carry valueSchema/keySchema") {
    val arr = parse(DebeziumSchema.descriptor(ArrayType(IntegerType, containsNull = false)))
    assert(arr.get("type").asText() === "array")
    assert(arr.get("valueSchema").get("type").asText() === "int32")
    val m = parse(DebeziumSchema.descriptor(
      MapType(StringType, StringType, valueContainsNull = true)))
    assert(m.get("type").asText() === "map")
    assert(m.get("keySchema").get("type").asText() === "string")
    assert(m.get("valueSchema").get("optional").asBoolean())
  }

  test("envelopeWithSchema rows parse and follow before/after presence rules") {
    val rows = graft.cdc.Cdc.envelopeWithSchema(spark, sf001)
      .limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val env = parse(r.getString(1))
      val payload = env.get("payload")
      val op = payload.get("op").asText()
      op match {
        case "r" | "c" => assert(payload.has("after") && !payload.has("before"))
        case "u"       => assert(payload.has("after") && payload.has("before"))
        case "d"       => assert(payload.has("before") && !payload.has("after"))
        case "m"       => assert(payload.has("message") &&
          payload.get("message").has("prefix") && payload.get("message").has("content"))
      }
      assert(payload.get("source").get("lsn").asText().startsWith("0/"))
      // op='m' rows carry the MessageValueSchema-based envelope
      // (eventschema.go:287-306); all others the table envelope
      val wantSchema =
        if (op == "m") "graft.message.Envelope" else "graft.public.events.Envelope"
      assert(env.get("schema").get("name").asText() === wantSchema)
      val key = parse(r.getString(2))
      if (op == "m") assert(key.get("payload").has("prefix"))
      else assert(key.get("payload").has("event_id"))
    }
  }
}
