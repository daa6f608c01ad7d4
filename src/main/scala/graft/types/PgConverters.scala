package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PG→event type conversion layer (SURVEY §1.2) as pure `Column`
  * functions — the Spark analog of the reference's converter table
  * (`internal/typemanager/coretypes.go:29-430`,
  * `internal/typemanager/builtin_converters.go`).
  *
  * All are built from `org.apache.spark.sql.functions` so they stay
  * inside whole-stage codegen; none is a Scala UDF. Semantics replicate
  * the reference byte-for-byte (lossy where the reference is lossy) so
  * envelope values hash-match an independent implementation.
  */
object PgConverters {

  /** `timestamp` → INT64 epoch-millis —
    * `builtin_converters.go:251-259` (timestamp2int64). */
  def timestampToMillis(c: Column): Column =
    // parquet NTZ timestamps arrive as TIMESTAMP_NTZ; with session tz
    // pinned to UTC the cast is instant-preserving and unix_millis applies
    unix_millis(c.cast(TimestampType))

  /** `date` → INT32 days-since-epoch —
    * `builtin_converters.go:185-196` (date2int32). */
  def dateToDays(c: Column): Column =
    datediff(to_date(c), lit("1970-01-01")).cast(IntegerType)

  /** `timestamptz` → RFC3339Nano UTC string —
    * `builtin_converters.go:208-223` (timestamp2text). Go's RFC3339Nano
    * trims trailing fractional zeros and omits the point when the
    * fraction is zero. Input is Long nanos-since-epoch (Tables.events).
    */
  def timestamptzNanosToText(nanosCol: String): Column = {
    // Integer `div`, not `/`: double division at 1e18 magnitude is inexact.
    // Fraction truncated to microseconds: PG timestamptz carries micro
    // precision, and engines reading TIMESTAMP(NANOS) parquet (DuckDB,
    // Spark without nanosAsLong) truncate to micros too.
    val sec  = expr(s"$nanosCol div 1000000000")
    val frac = expr(s"($nanosCol % 1000000000) div 1000 * 1000")
    val datePart = date_format(timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ss")
    // rtrim-by-charset == strip trailing zeros (cheaper than a regexp in
    // the per-row hot path; DuckDB twin uses the same rtrim)
    val fracStr  = rtrim(lpad(frac.cast(StringType), 9, "0"), "0")
    concat(datePart,
      when(frac > 0, concat(lit("."), fracStr)).otherwise(lit("")),
      lit("Z"))
  }

  /** `time` → STRING `HH:MM:SS.ffffff` —
    * `builtin_converters.go:225-249` (time2text). */
  def timeToText(c: Column): Column = date_format(c, "HH:mm:ss.SSSSSS")

  /** `interval` → INT64 micros with the reference's average-month
    * rounding: 1 month = 365.25/12 days = 30.4375 d —
    * `builtin_converters.go:350-360` + constants at `:48-49`. */
  val MicrosPerMonth = 2629800000000L // 30.4375 * 86_400_000_000
  val MicrosPerDay   = 86400000000L
  def intervalToMicros(months: Column, days: Column, micros: Column): Column =
    months.cast(LongType) * MicrosPerMonth +
      days.cast(LongType) * MicrosPerDay + micros.cast(LongType)

  /** `numeric` → FLOAT64 (lossy by design) —
    * `builtin_converters.go:362-374` (numeric2float64). */
  def numericToDouble(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale)).cast(DoubleType)

  /** `bytea` → lowercase hex STRING —
    * `builtin_converters.go:376-384` (bytes2hexstring). */
  def byteaToHex(c: Column): Column = lower(hex(c))

  /** `bit`/`varbit` → STRING of 0/1 — `builtin_converters.go:261-284`.
    * Input modeled as a long + bit length. */
  def bitsToString(value: Column, bits: Int): Column =
    lpad(bin(value), bits, "0")

  /** `json`/`jsonb` → STRING — `builtin_converters.go:286-298`; field
    * extraction for filter pushdown on json payloads. */
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)

  /** `uuid`, `ltree`, `inet`, `macaddr`, enum, xml → STRING passthrough —
    * `builtin_converters.go:300-348,386-397`. */
  def textPassthrough(c: Column): Column = c.cast(StringType)

  /** `oid`/`xid`/`cid` (uint32) → INT64 —
    * `builtin_converters.go:320-328` (uint322int64). */
  def uint32ToLong(c: Column): Column =
    when(c < 0, c.cast(LongType) + 4294967296L).otherwise(c.cast(LongType))

  /** Range types → STRING `[lo,hi)` — `builtin_converters.go:574-661`
    * (range2string + per-kind transformers; canonical PG discrete-range
    * form is inclusive-lo/exclusive-hi). */
  def rangeToString(lo: Column, hi: Column): Column =
    concat(lit("["), lo.cast(StringType), lit(","), hi.cast(StringType), lit(")"))

  /** Geometric text forms — `builtin_converters.go:417-572`: PG point
    * `(x,y)`, box `(x1,y1),(x2,y2)`. */
  def pointToText(x: Column, y: Column): Column =
    concat(lit("("), x.cast(StringType), lit(","), y.cast(StringType), lit(")"))
  def boxToText(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    concat(pointToText(x1, y1), lit(","), pointToText(x2, y2))

  /** `line` → STRING `{A,B,C}` (PG linear-equation form) —
    * geometry text forms, `builtin_converters.go:417-572`. */
  def lineToText(a: Column, b: Column, c: Column): Column =
    concat(lit("{"), a.cast(StringType), lit(","), b.cast(StringType),
      lit(","), c.cast(StringType), lit("}"))

  /** `lseg` → STRING `[(x1,y1),(x2,y2)]`. */
  def lsegToText(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    concat(lit("["), pointToText(x1, y1), lit(","), pointToText(x2, y2), lit("]"))

  /** `path` → STRING: closed `((x,y),...)`, open `[(x,y),...]`. */
  def pathToText(closed: Boolean, points: (Column, Column)*): Column = {
    val body = points.map { case (x, y) => pointToText(x, y) }
      .reduce((a, b) => concat(a, lit(","), b))
    if (closed) concat(lit("("), body, lit(")"))
    else concat(lit("["), body, lit("]"))
  }

  /** `polygon` → STRING `((x1,y1),...,(xn,yn))`. */
  def polygonToText(points: (Column, Column)*): Column =
    pathToText(closed = true, points: _*)

  /** `circle` → STRING `<(x,y),r>`. */
  def circleToText(x: Column, y: Column, r: Column): Column =
    concat(lit("<"), pointToText(x, y), lit(","), r.cast(StringType), lit(">"))

  /** `macaddr` → STRING `aa:bb:cc:dd:ee:ff` from the low 48 bits of a
    * long; `macaddr8` (EUI-64) takes the low 64. pgx hands the reference
    * the text form — here the formatter IS the converter, kept in codegen
    * via format_string. */
  def macaddrToText(v: Column): Column =
    format_string("%02x:%02x:%02x:%02x:%02x:%02x",
      shiftright(v, 40).bitwiseAND(255), shiftright(v, 32).bitwiseAND(255),
      shiftright(v, 24).bitwiseAND(255), shiftright(v, 16).bitwiseAND(255),
      shiftright(v, 8).bitwiseAND(255), v.bitwiseAND(255))
  def macaddr8ToText(v: Column): Column =
    format_string("%02x:%02x:%02x:%02x:%02x:%02x:%02x:%02x",
      shiftrightunsigned(v, 56).bitwiseAND(255), shiftright(v, 48).bitwiseAND(255),
      shiftright(v, 40).bitwiseAND(255), shiftright(v, 32).bitwiseAND(255),
      shiftright(v, 24).bitwiseAND(255), shiftright(v, 16).bitwiseAND(255),
      shiftright(v, 8).bitwiseAND(255), v.bitwiseAND(255))

  /** `uuid` → STRING 8-4-4-4-12 from 32 hex chars —
    * `builtin_converters.go:300-318` renders the canonical text form. */
  def uuidFromHex32(hex32: Column): Column =
    concat_ws("-",
      substring(hex32, 1, 8), substring(hex32, 9, 4), substring(hex32, 13, 4),
      substring(hex32, 17, 4), substring(hex32, 21, 12))

  /** `timetz` → STRING `HH:MM:SS.ffffff+00` (UTC-normalized, the
    * reference emits the session-UTC text form). */
  def timetzToText(c: Column): Column =
    concat(date_format(c, "HH:mm:ss.SSSSSS"), lit("+00"))

  /** `char(n)` blank-padding: PG bpchar semantics — stored values are
    * space-padded to the declared width; passthrough must preserve it. */
  def bpcharPad(c: Column, n: Int): Column = rpad(c.cast(StringType), n, " ")

  /** hstore → MAP(string,string) — `builtin_converters.go:399-415`,
    * schema `schemabuilder.go:181-183`. */
  def hstoreToMap(jsonText: Column): Column =
    from_json(jsonText, MapType(StringType, StringType, valueContainsNull = true))

  /** Array variants — the reference registers an `arrayConverter` per
    * element type (`builtin_converters.go:56-100`); here any scalar
    * converter lifts over arrays with `transform`. The lambda evaluates
    * interpreted (higher-order functions are CodegenFallback), which is
    * the right trade here: conversion arrays are element-width-bounded
    * (not corpus-scale like shingles), so a per-type codegen kernel
    * would buy little for a lot of surface.
    */
  def arrayOf(conv: Column => Column)(arr: Column): Column =
    transform(arr, conv)

  /** Enum → STRING with the allowed-values list carried as column
    * metadata — `builtin_converters.go:145-153` (enum2string) +
    * `schemabuilder.go:133-141` (`schema.Enum` allowed params). */
  def enumToString(c: Column, allowed: Seq[String]): Column = {
    val md = new MetadataBuilder().putStringArray("allowed", allowed.toArray).build()
    c.cast(StringType).as("enum", md)
  }

  /** Composite (user-defined record) → nested STRUCT with per-attribute
    * fields — `typemanager.go:419-430`; attribute order from the catalog
    * (`queries.go:202-210`). */
  def compositeToStruct(fields: (String, Column)*): Column =
    struct(fields.map { case (n, c) => c.as(n) }: _*)

  /** Unchunked base64: the reference uses Go's `base64.StdEncoding`
    * (`builtin_converters.go:117`), which never inserts line breaks;
    * Spark's `base64()` is the MIME encoder (CRLF every 76 output chars,
    * i.e. every 57 input bytes), so strip the breaks to keep byte parity
    * for arbitrary content lengths. */
  def base64Std(c: Column): Column = replace(base64(c), lit("\r\n"), lit(""))

  /** PostGIS geometry/geography → STRUCT {wkb: base64, srid: int} —
    * `builtin_converters.go:102-143` (postgis2struct), schema
    * `spi/schema/schemabuilder.go:185-195`. */
  def postgisToStruct(wkb: Column, srid: Column): Column =
    struct(base64Std(wkb).as("wkb"), srid.cast(IntegerType).as("srid"))
}
