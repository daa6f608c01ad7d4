package graft

import graft.types.PgConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's data-type matrix
  * (`/root/reference/tests/datatype_test.go:37-1094`, FIXTURES.md §2):
  * per type — expected event-schema type and converted value, scalar and
  * array variants.
  */
class ConvertersSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("v")).head.getAs[T]("v")

  test("bytea → lowercase hex (datatype_test.go:55-72: DEADBEEF → 'deadbeef')") {
    val v = Seq(Array[Byte](0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte))
      .toDF("b").select(byteaToHex(col("b"))).head.getString(0)
    assert(v === "deadbeef")
  }

  test("timestamp → epoch millis INT64") {
    val df = Seq(java.sql.Timestamp.valueOf("2023-03-25 00:01:00")).toDF("ts")
    val out = df.select(timestampToMillis(col("ts")).as("v"))
    assert(out.schema("v").dataType === LongType)
    assert(out.head.getLong(0) === 1679702460000L)
  }

  test("date → days since epoch INT32") {
    val df = Seq(java.sql.Date.valueOf("1970-01-11")).toDF("d")
    val out = df.select(dateToDays(col("d")).as("v"))
    assert(out.schema("v").dataType === IntegerType)
    assert(out.head.getInt(0) === 10)
  }

  test("timestamptz nanos → RFC3339 text, trailing-zero trim and zero-fraction omission") {
    val df = Seq(
      (1L, 1704067200000000000L),        // exactly midnight → no fraction
      (2L, 1704067200500000000L),        // .5 → ".5"
      (3L, 1704067200123456000L)         // micros → ".123456"
    ).toDF("id", "ns")
    val got = df.select(col("id"), timestamptzNanosToText("ns").as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got(0) === "2024-01-01T00:00:00Z")
    assert(got(1) === "2024-01-01T00:00:00.5Z")
    assert(got(2) === "2024-01-01T00:00:00.123456Z")
  }

  test("interval → micros with avg-month 30.4375d (builtin_converters.go:48-49)") {
    val df = Seq((2, 3, 500000L)).toDF("m", "d", "us")
    assert(df.select(intervalToMicros(col("m"), col("d"), col("us"))).head.getLong(0) ===
      2L * 2629800000000L + 3L * 86400000000L + 500000L)
  }

  test("numeric → double is lossy by design (2-decimal rounding)") {
    val df = Seq(1.005, 9.999).toDF("x")
    val got = df.select(numericToDouble(col("x")).as("v")).collect().map(_.getDouble(0))
    // Spark rounds via the double's shortest decimal rendering ("1.005" →
    // HALF_UP → 1.01); engines rounding the binary value (1.00499…)
    // yield 1.00. Only exact-boundary inputs diverge — oracle queries
    // only aggregate data already carrying ≤2 decimals.
    assert(got(0) === 1.01)
    assert(got(1) === 10.0)
  }

  test("range and geometric text forms") {
    val df = Seq((1, 11)).toDF("lo", "hi")
    assert(df.select(rangeToString(col("lo"), col("hi"))).head.getString(0) === "[1,11)")
    assert(df.select(pointToText(col("lo"), col("hi"))).head.getString(0) === "(1,11)")
    assert(df.select(boxToText(lit(0), lit(0), col("lo"), col("hi"))).head.getString(0)
      === "(0,0),(1,11)")
  }

  test("hstore → map(string,string)") {
    val df = Seq("""{"k1":"v1","k2":null}""").toDF("h")
    val out = df.select(hstoreToMap(col("h")).as("m"))
    assert(out.schema("m").dataType ===
      MapType(StringType, StringType, valueContainsNull = true))
    val m = out.head.getMap[String, String](0)
    assert(m("k1") === "v1")
  }

  test("array variants lift every scalar converter (arrayConverter parity)") {
    // array of dates → array of int32 days
    val dates = Seq(Seq(java.sql.Date.valueOf("1970-01-02"), java.sql.Date.valueOf("1970-01-03")))
      .toDF("ds")
    val days = dates.select(arrayOf(dateToDays)(col("ds")).as("v"))
    assert(days.schema("v").dataType === ArrayType(IntegerType, containsNull = true))
    assert(days.head.getSeq[Int](0) === Seq(1, 2))
    // array of bytea → array of hex strings
    val bs = Seq(Seq(Array[Byte](0x0f), Array[Byte](0xff.toByte))).toDF("bs")
    assert(bs.select(arrayOf(byteaToHex)(col("bs"))).head.getSeq[String](0) === Seq("0f", "ff"))
    // array of timestamps → array of millis
    val tss = Seq(Seq(java.sql.Timestamp.valueOf("1970-01-01 00:00:01"))).toDF("ts")
    assert(tss.select(arrayOf(timestampToMillis)(col("ts"))).head.getSeq[Long](0) === Seq(1000L))
  }

  test("uint32/bits/uuid-style passthroughs") {
    assert(Seq(-2).toDF("x").select(uint32ToLong(col("x"))).head.getLong(0) === 4294967294L)
    assert(Seq(255).toDF("x").select(bitsToString(col("x"), 12)).head.getString(0) === "000011111111")
    assert(Seq(("x", 42)).toDF("a", "b")
      .select(textPassthrough(col("b"))).head.getString(0) === "42")
  }

  test("enum carries allowed values as metadata; composite nests struct") {
    val df = Seq(("red", 1, "x")).toDF("e", "a", "b")
    val out = df.select(enumToString(col("e"), Seq("red", "green", "blue")))
    assert(out.schema.head.metadata.getStringArray("allowed").toSeq ===
      Seq("red", "green", "blue"))
    assert(out.head.getString(0) === "red")
    val comp = df.select(compositeToStruct("a" -> col("a"), "b" -> col("b")).as("c"))
    assert(comp.schema("c").dataType.isInstanceOf[StructType])
    assert(comp.select("c.a").head.getInt(0) === 1)
  }

  test("postgis struct shape {wkb: base64, srid}") {
    val df = Seq((Array[Byte](1, 2, 3), 4326)).toDF("wkb", "srid")
    val r = df.select(postgisToStruct(col("wkb"), col("srid")).as("g")).select("g.*").head
    assert(r.getString(0) === java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    assert(r.getInt(1) === 4326)
  }
}
