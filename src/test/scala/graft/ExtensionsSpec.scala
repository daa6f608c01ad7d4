package graft

/** SQL-surface registration of the custom expressions. Uses the shared
  * session + registerTo (the extensions-at-construction path applies the
  * same registration list; suite order means the shared session may
  * already exist without extensions). */
class ExtensionsSpec extends SparkSpec {
  test("registered SQL functions vec_dot/vec_norm2/fnv_hash64 evaluate") {
    GraftExtensions.registerTo(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       vec_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       fnv_hash64('a') AS h""".stripMargin).head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    assert(r.getLong(2) === 0xaf63dc4c8601ec8cL)
  }
}
