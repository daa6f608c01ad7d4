package graft

import graft.streaming.SchemaEvolution
import graft.streaming.SchemaEvolution._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-diff semantics mirroring `ApplySchemaUpdate`
  * (`internal/systemcatalog/systemcatalog.go:347-373`,
  * `basetable.go:89-130`). */
class SchemaEvolutionSpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("value", DoubleType)))

  test("no change → empty diff") {
    assert(SchemaEvolution.diff(base, base).isEmpty)
  }

  test("added and dropped columns") {
    val next = StructType(base.fields.filterNot(_.name == "value") :+
      StructField("extra", IntegerType))
    val d = SchemaEvolution.diff(base, next)
    assert(d.contains(Dropped("value", DoubleType)))
    assert(d.contains(Added("extra", IntegerType)))
  }

  test("positional rename with same type is a rename, not add+drop") {
    val next = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("full_name", StringType),
      StructField("value", DoubleType)))
    assert(SchemaEvolution.diff(base, next) === Seq(Renamed("name", "full_name")))
  }

  test("type and nullability changes") {
    val next = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType),
      StructField("value", DecimalType(18, 2))))
    val d = SchemaEvolution.diff(base, next)
    assert(d.contains(TypeChanged("value", DoubleType, DecimalType(18, 2))))
    assert(d.contains(NullabilityChanged("id", nowNullable = true)))
  }

  test("schemaGuard passes matching batches and fails loudly on DDL") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "a", 1.0)).toDF("id", "name", "value")
    // passthrough when schema matches (modulo nullability of literals)
    val guarded = SchemaEvolution.schemaGuard(df.schema)(df)
    assert(guarded.count() === 1)
    val widened = df.withColumn("extra", org.apache.spark.sql.functions.lit(1))
    val ex = intercept[SchemaChangedException] {
      SchemaEvolution.schemaGuard(df.schema)(widened)
    }
    assert(ex.changes === Seq(Added("extra", IntegerType)))
    assert(ex.getMessage.contains("restart-on-DDL"))
  }
}
