package graft

import org.apache.spark.sql.SparkSession

/** Time a single query N times through the same noop-write path Bench
  * uses — the perf inner loop (`runMain graft.BenchOne <name> <sfDir> [n]`). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <queryName> <sfDir> [iters]")
    val name = args(0); val sfDir = args(1)
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // codegen falls back to interpreted expressions once a generated
      // method exceeds HotSpot's 8 KB JIT-compile limit (the 64 KB default
      // guards Janino, not the JIT): an un-JIT-able giant method runs as
      // interpreted BYTECODE, ~3x slower than Spark's interpreted
      // expression path on the wide conversion sweeps
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // same shuffle-writer setting as Bench (see the comment there)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS_THRESHOLD", "1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
