package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query end-to-end at
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries are forced through a `noop` write (computes every column,
  * discards output): `count()` would let Catalyst prune projections and
  * under-measure compute-heavy operators.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up action so JVM/codegen startup isn't billed to the first query
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    // median of 3 runs per query: at small SF the suite is dominated by
    // per-plan codegen compilation and JIT/GC scheduling — single-shot
    // timings vary >5× run-to-run and manufacture phantom regressions
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
