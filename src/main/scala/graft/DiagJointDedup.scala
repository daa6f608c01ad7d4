package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Web}

/** One-off diagnostic for NOTES.md: per-stage cost and CC-round counts
  * of web_joint_dedup at a given SF. Not part of the bench surface. */
object DiagJointDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val synthUrl = concat(lit("https://h"), pmod(col("doc_id"), lit(40)),
      lit(".example/p/"), pmod(col("doc_id"), lit(173)))
    val withUrl = docs.select(col("doc_id"), Web.urlNormalize(synthUrl).as("u"))
    val ka = withUrl.groupBy(col("u")).agg(min(col("doc_id")).as("ka"))
    val anchors = withUrl.join(ka, "u")
      .select(col("doc_id"), col("ka").as("anchor")).cache()
    timed("anchors build+count") {
      println(s"[diag] docs=${docs.count()} anchors=${anchors.count()} " +
        s"urlGroups=${anchors.select("anchor").distinct().count()}")
    }
    val lsh = timed("lsh pairs") {
      val p = Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b")).cache()
      println(s"[diag] lshPairs=${p.count()}"); p
    }
    val quotient = timed("quotient edges") {
      val q = lsh
        .join(anchors.select(col("doc_id").as("doc_a"), col("anchor").as("__aa")), "doc_a")
        .join(anchors.select(col("doc_id").as("doc_b"), col("anchor").as("__ab")), "doc_b")
        .select(col("__aa").as("doc_a"), col("__ab").as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b")).cache()
      println(s"[diag] quotientEdges(dup incl)=${q.count()} " +
        s"distinct=${q.distinct().count()}"); q
    }
    val (labels, fellBack, rounds) = timed("clusters (quotient)") {
      Dedup.clustersAdaptiveWithInfo(quotient)
    }
    println(s"[diag] ccRounds=$rounds fellBackToStar=$fellBack labels=${labels.count()}")
    // the r13 union-graph form for comparison
    val unionPairs = withUrl.join(ka, "u").filter(col("doc_id") > col("ka"))
      .select(col("ka").as("doc_a"), col("doc_id").as("doc_b"))
      .unionByName(lsh).distinct()
    val (l2, fb2, r2) = timed("clusters (r13 union graph)") {
      Dedup.clustersAdaptiveWithInfo(unionPairs)
    }
    println(s"[diag] unionEdges=${unionPairs.count()} ccRoundsUnion=$r2 " +
      s"fellBackUnion=$fb2 labelsUnion=${l2.count()}")
    spark.stop()
  }
}
