package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the custom expressions. */
class ExtensionsSpec extends AnyFunSuite {
  test("extensions expose vec_dot/vec_norm2/fnv_hash64 to SQL") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       vec_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
          |       fnv_hash64('a') AS h""".stripMargin).head
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 25.0)
      assert(r.getLong(2) === 0xaf63dc4c8601ec8cL)
    } finally { /* shared-JVM session: leave running for other suites */ }
  }
}
