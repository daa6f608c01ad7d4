package graft

import org.apache.spark.sql.SparkSession

/** Single-query debug runner: `runMain graft.RunQuery <name> <sfDir>
  * [explain]` — shows a sample, the row count, and (with `explain`) the
  * formatted physical plan. The fast inner loop for plan audits that
  * `Verify` (all queries) and `Bench` (timings) are too heavy for.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <queryName> <sfDir> [explain]")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // codegen falls back to interpreted expressions once a generated
      // method exceeds HotSpot's 8 KB JIT-compile limit (the 64 KB default
      // guards Janino, not the JIT): an un-JIT-able giant method runs as
      // interpreted BYTECODE, ~3x slower than Spark's interpreted
      // expression path on the wide conversion sweeps
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.show(5, truncate = false)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    println("ROWS=" + df.count())
    spark.stop()
  }
}
