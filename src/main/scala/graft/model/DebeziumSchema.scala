package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Debezium self-describing `{schema, payload}` schema-JSON generator —
  * SURVEY §1.3's `debeziumSchemaOf(StructType): Column`.
  *
  * Reference: `spi/schema/schemabuilder.go:413-474` (Build), logical type
  * names `:27-37`, envelope/key schemas `spi/schema/eventschema.go:180-324`,
  * field-name constants `spi/schema/schemamodel.go:49-83`.
  *
  * The descriptor is a function of the *plan-time* schema, so it renders
  * to a constant JSON string on the driver and ships as a `lit` column —
  * zero per-row work, exactly how the reference caches one schema per
  * table. JSON object keys are emitted in sorted order, matching Go's
  * `encoding/json` map marshaling (the reference's `Struct` is a map).
  *
  * Faithfully replicated quirks:
  *   - builder-built descriptors omit `"optional"` when false
  *     (`schemabuilder.go:452-454`); literal-struct schemas (key schemas,
  *     `simpleSchemaElement`) always include it (`eventschema.go:363-374`)
  *   - `source.ts_ms` is declared STRING in the schema though the payload
  *     carries int64 (`eventschema.go:311` vs `:216`)
  *   - `index` is emitted only when >= 0 (table columns get 0..n-1;
  *     envelope-level fields are added with -1)
  */
object DebeziumSchema {

  // logical schema names — schemabuilder.go:27-37 (Ltree typo included)
  val BitsSchemaName      = "io.debezium.data.Bits"
  val EnumSchemaName      = "io.debezium.data.Enum"
  val LtreeSchemaName     = "io.debezium.data.Lree"
  val JsonSchemaName      = "io.debezium.data.Json"
  val UuidSchemaName      = "io.debezium.data.Uuid"
  val XmlSchemaName       = "io.debezium.data.Xml"
  val GeographySchemaName = "io.debezium.data.geometry.Geography"
  val GeometrySchemaName  = "io.debezium.data.geometry.Geometry"
  val PointSchemaName     = "io.debezium.data.geometry.Point"
  // eventschema.go:29-33
  val SourceSchemaName         = "io.debezium.connector.postgresql.Source"
  val MessageBlockSchemaName   = "io.debezium.connector.postgresql.Message"
  val MessageKeySchemaName     = "io.debezium.connector.postgresql.MessageKey"
  val MessageValueSchemaName   = "io.debezium.connector.postgresql.MessageValue"
  val TimescaleEventSchemaName = "com.timescale.Event"

  /** Spark type → Debezium schema type string (schemamodel.go:33-44). */
  def typeName(dt: DataType): String = dt match {
    case ByteType                       => "int8"
    case ShortType                      => "int16"
    case IntegerType | DateType         => "int32"
    case LongType | TimestampType | TimestampNTZType => "int64"
    case FloatType                      => "float32"
    case DoubleType                     => "float64"
    case BooleanType                    => "boolean"
    case StringType                     => "string"
    case BinaryType                     => "bytes"
    case _: ArrayType                   => "array"
    case _: MapType                     => "map"
    case _: DecimalType                 => "float64" // numeric2float64
    case _: StructType                  => "struct"
    case other => throw new IllegalArgumentException(s"no Debezium mapping for $other")
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Render an object with Go-map key ordering (sorted). Values are
    * pre-rendered JSON. */
  private def jobj(pairs: (String, String)*): String =
    pairs.sortBy(_._1).map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")

  /** Recursive descriptor for one schema node, builder-Build() semantics. */
  def descriptor(dt: DataType, fieldName: Option[String] = None,
                 name: Option[String] = None, optional: Boolean = false,
                 index: Int = -1, default: Option[String] = None,
                 emitColumnIndices: Boolean = true): String = {
    val base = scala.collection.mutable.ListBuffer[(String, String)](
      "type" -> jstr(typeName(dt)))
    dt match {
      case st: StructType =>
        val fields = st.fields.zipWithIndex.map { case (f, i) =>
          val logical = if (f.metadata.contains("debezium.name"))
            Some(f.metadata.getString("debezium.name")) else None
          descriptor(f.dataType, Some(f.name), logical, f.nullable,
            index = if (emitColumnIndices) i else -1)
        }
        base += "fields" -> fields.mkString("[", ",", "]")
      case ArrayType(et, elementNullable) =>
        base += "valueSchema" -> descriptor(et, optional = elementNullable)
      case MapType(kt, vt, valueNullable) =>
        base += "keySchema" -> descriptor(kt)
        base += "valueSchema" -> descriptor(vt, optional = valueNullable)
      case _ => ()
    }
    fieldName.foreach(f => base += "field" -> jstr(f))
    name.foreach(n => base += "name" -> jstr(n))
    if (index > -1) base += "index" -> index.toString
    if (optional) base += "optional" -> "true"
    default.foreach { d =>
      // schemabuilder.go:456-468: bool → int64 → float64 → string
      val rendered =
        if (d == "true" || d == "false") d
        else if (d.matches("-?\\d+")) d
        else if (scala.util.Try(d.toDouble).isSuccess) d.toDouble.toString
        else jstr(d)
      base += "default" -> rendered
    }
    jobj(base.toSeq: _*)
  }

  /** `source` block descriptor — eventschema.go:304-323. */
  def sourceSchemaJson: String = {
    def f(field: String, tpe: String, optional: Boolean = false,
          default: Option[String] = None): String = {
      val b = scala.collection.mutable.ListBuffer[(String, String)](
        "type" -> jstr(tpe), "field" -> jstr(field))
      if (optional) b += "optional" -> "true"
      default.foreach(d => b += "default" -> d)
      jobj(b.toSeq: _*)
    }
    jobj(
      "type" -> jstr("struct"),
      "field" -> jstr("source"),
      "name" -> jstr(SourceSchemaName),
      "fields" -> Seq(
        f("version", "string"), f("connector", "string"), f("name", "string"),
        f("ts_ms", "string"), // STRING in the reference's source schema
        f("snapshot", "boolean", default = Some("false")),
        f("schema", "string"), f("table", "string"),
        f("txId", "int64"), f("lsn", "int64"), f("xmin", "int64")
      ).mkString("[", ",", "]"))
  }

  /** Full envelope value schema — eventschema.go:266-285: before/after
    * (row schema as `{topic}.Value`), source, op, tsdb_op, ts_ms. */
  def envelopeSchemaJson(row: StructType, schemaTopicName: String): String = {
    val valueName = s"$schemaTopicName.Value"
    def rowDesc(fieldName: String) =
      descriptor(row, Some(fieldName), Some(valueName))
    def simple(field: String, tpe: String, optional: Boolean) = {
      val b = scala.collection.mutable.ListBuffer[(String, String)](
        "type" -> jstr(tpe), "field" -> jstr(field))
      if (optional) b += "optional" -> "true"
      jobj(b.toSeq: _*)
    }
    jobj(
      "type" -> jstr("struct"),
      "name" -> jstr(s"$schemaTopicName.Envelope"),
      "fields" -> Seq(
        rowDesc("before"), rowDesc("after"), sourceSchemaJson,
        // builder-built Fields (String()/Int64(), eventschema.go:281-283):
        // Build omits the optional key when false — for ALL THREE of
        // op/tsdb_op/ts_ms, unlike simpleSchemaElement literals
        simple("op", "string", optional = false),
        simple("tsdb_op", "string", optional = false),
        simple("ts_ms", "int64", optional = false)
      ).mkString("[", ",", "]"))
  }

  /** Literal-struct element — eventschema.go:363-372: `optional` is
    * ALWAYS present (true or false), unlike builder-built fields. */
  private def simpleElement(field: String, tpe: String, optional: Boolean): String =
    jobj("type" -> jstr(tpe), "optional" -> optional.toString, "field" -> jstr(field))

  /** op='m' message block — eventschema.go:352-361. */
  def messageBlockSchemaJson: String =
    jobj(
      "version" -> "1",
      "name" -> jstr(MessageBlockSchemaName),
      "fields" -> Seq(
        simpleElement("prefix", "string", optional = false),
        simpleElement("content", "string", optional = true)).mkString("[", ",", "]"))

  /** op='m' value schema — eventschema.go:325-340 (version:1, message
    * block nested under the `message` key, no before/after). */
  def messageValueSchemaJson: String =
    jobj(
      "version" -> "1",
      "name" -> jstr(MessageValueSchemaName),
      "fields" -> Seq(
        simpleElement("op", "string", optional = false),
        simpleElement("ts_ms", "int64", optional = true),
        sourceSchemaJson,
        jobj("field" -> jstr("message"), "optional" -> "false",
          "message" -> messageBlockSchemaJson)).mkString("[", ",", "]"))

  /** op='m' envelope schema — eventschema.go:287-306
    * (EnvelopeMessageSchema: a literal struct, so `optional`:false IS
    * present at the top level and on the simple elements). */
  def messageEnvelopeSchemaJson(messageTopicName: String): String =
    jobj(
      "type" -> jstr("struct"),
      "name" -> jstr(s"$messageTopicName.Envelope"),
      "optional" -> "false",
      "fields" -> Seq(
        messageValueSchemaJson,
        sourceSchemaJson,
        simpleElement("op", "string", optional = false),
        simpleElement("tsdb_op", "string", optional = true),
        simpleElement("ts_ms", "int64", optional = true)).mkString("[", ",", "]"))

  /** PK key schema — eventschema.go:228-252 (literal struct: `optional`
    * always present; elements are `keySchemaElement`s). */
  def keySchemaJson(schemaTopicName: String, pk: Seq[(String, DataType)]): String =
    jobj(
      "type" -> jstr("struct"),
      "name" -> jstr(s"$schemaTopicName.Key"),
      "optional" -> "false",
      "fields" -> pk.zipWithIndex.map { case ((n, dt), i) =>
        jobj("name" -> jstr(n), "index" -> i.toString,
          "schema" -> jobj("type" -> jstr(typeName(dt)), "optional" -> "false"))
      }.mkString("[", ",", "]"))

  /** op='m' key schema — eventschema.go:342-351. */
  def messageKeySchemaJson: String =
    jobj(
      "version" -> "1",
      "name" -> jstr(MessageKeySchemaName),
      "fields" -> Seq(jobj("type" -> jstr("string"), "optional" -> "true",
        "field" -> jstr("prefix"))).mkString("[", ",", "]"))

  /** op='$' key schema — eventschema.go:254-264. */
  def timescaleKeySchemaJson: String =
    jobj(
      "type" -> jstr("struct"),
      "name" -> jstr(TimescaleEventSchemaName),
      "optional" -> "false",
      "fields" -> Seq(
        jobj("type" -> jstr("string"), "optional" -> "false", "field" -> jstr("schema")),
        jobj("type" -> jstr("string"), "optional" -> "false", "field" -> jstr("table"))
      ).mkString("[", ",", "]"))

  /** SURVEY §1.3 contract: the schema subtree as a constant Column. */
  def debeziumSchemaOf(st: StructType, schemaTopicName: String): Column =
    lit(envelopeSchemaJson(st, schemaTopicName))
}
