package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for SCALING.md: dedup_edit_distance's candidate
  * geometry across the synthetic decade — default dfCap (pre-cap
  * quadratic regime) vs a cap low enough to engage (the 100 TB
  * posture), timed on the same inputs. Usage:
  *   runMain graft.DiagEditDistance <sfDir> [dfCap]
  */
object DiagEditDistance {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = if (args.length > 1) args(1).toInt else 250
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val titles = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("text"))
    def run(label: String, dfCap: Int): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.editDistancePairs(titles, k = 6, dfCap = dfCap).count()
      println(f"[diag] $label dfCap=$dfCap iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
    }
    run("default", graft.ops.Dedup.DefaultDfCap)
    run("capped", cap)
    spark.stop()
  }
}
