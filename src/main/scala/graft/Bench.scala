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
    // Failures must not read as (fast) timings: each query carries an "err"
    // field and any failure makes the whole run exit nonzero, so a regression
    // that breaks a query can never masquerade as a speedup.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (name, times(times.length / 2), err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
