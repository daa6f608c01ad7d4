package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round artifact tool: dumps `.explain("formatted")` for a
  * comma-separated list of queries to `<outDir>/<name>_<tag>.txt`.
  * NOTE: queries with driver-side control flow execute real jobs during
  * CONSTRUCTION (cdc boundary `.head` aggregations, eager
  * localCheckpoint pins, bpeFit's per-merge collects, the ANN fit
  * loops), so `PlanDump all` runs substantial work — only the final
  * plan's own action is skipped. Usage:
  * `runMain graft.PlanDump <names|all> <sfDir> <outDir> <tag>`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <names|all> <sfDir> <outDir> <tag>")
    val names =
      if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val sfDir = args(1); val outDir = args(2); val tag = args(3)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
