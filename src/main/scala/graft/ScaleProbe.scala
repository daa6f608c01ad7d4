package graft

import org.apache.spark.sql.SparkSession

/** Parametrized scale probes that the fixed-parameter Bench gates can't
  * express (verdict-15 directive #5, the 5th decade). The gate form of
  * `ann_lsh_cosine` pins nPlanes=8 for oracle parity; its bucket join
  * is Θ(n²/2^nPlanes), so past bucket saturation the GATE is
  * data-quadratic by construction while the documented deployment
  * posture (nPlanes = lshPlanesFor(n)) is linear. This main measures
  * both arms on the same input so SCALING.md can separate the two.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [probe,probe,...]
  * Probes: lsh_fixed (gate shape), lsh_scaled (occupancy-pinned).
  * Iterations via SPARK_GRAFT_BENCH_ITERS (default 1 — probe inputs
  * are big enough that a single run is past the noise floor).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir> [probe,...]")
    val dir = args(0)
    val only: Option[Set[String]] =
      args.drop(1).headOption.filter(_.nonEmpty).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val dim = emb.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).head.getInt(0)
    val scaledPlanes = ops.Similarity.lshPlanesFor(n)
    val probes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "lsh_fixed" -> (() => ops.Similarity.lshCosinePairs(emb, dim, 0.3)),
      "lsh_scaled" -> (() =>
        ops.Similarity.lshCosinePairs(emb, dim, 0.3, nPlanes = scaledPlanes)),
    )
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
    val results = probes.filter(p => only.forall(_.contains(p._1))).map {
      case (name, mk) =>
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")
    println(s"""{"metric":"probe","sf":"$dir","n_vectors":$n,""" +
      s""""scaled_planes":$scaledPlanes,"queries":{$qs}}""")
    spark.stop()
  }
}
