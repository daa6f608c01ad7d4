package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over an edge list `(src, dst)` — the link
  * analysis every web-corpus pipeline runs before sampling (quality
  * weighting by PageRank is standard in CommonCrawl-derived corpora;
  * the min-label connected components in [[Dedup]] cover the clustering
  * half of the graph family, this covers the centrality half).
  *
  * All arithmetic is exact integer fixed-point (rank in micro-units,
  * damping as a rational `dampNum/dampDen`, `div` everywhere) so a SQL
  * oracle can unroll the identical iterations and hash-match: there is
  * no floating-point accumulation order to disagree about.
  */
object Graph {

  /** PageRank, `iters` synchronous iterations, integer micro-unit fixed
    * point: every node starts at `scale`; each iteration a node keeps
    * the teleport share `scale·(dampDen-dampNum) div dampDen` and
    * receives `dampNum·Σ(rank(u) div outdeg(u)) div dampDen` over its
    * in-edges. Dangling mass is dropped (classic simplification; the
    * oracle drops it identically).
    *
    * Scale shape per iteration: ONE join of the (static) edge list with
    * the rank vector on `src` + ONE partial-agg shuffle on `dst`. The
    * edge list is hash-repartitioned on `src` once up front, so every
    * iteration's join reuses that exchange (ReusedExchange) and only the
    * (|nodes|-sized) rank vector moves. The rank lineage is cut with
    * `localCheckpoint` each iteration — without it the plan doubles per
    * round and analysis time, not data, becomes the bottleneck (same
    * posture as Dedup.clusters' label propagation).
    */
  def pageRankInt(edges: DataFrame, iters: Int, scale: Long = 1000000L,
                  dampNum: Long = 85L, dampDen: Long = 100L,
                  checkpoint: Boolean = true): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen,
      s"bad damping $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst")).repartition(col("src")).cache()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val teleport = scale * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = e.join(out, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("contrib"))
      val sums = contribs.groupBy("node").agg(sum(col("contrib")).as("s"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(s, cast(0 as bigint))) div $dampDen")).as("rank"))
      ranks = if (checkpoint) next.localCheckpoint(eager = false) else next
    }
    ranks
  }
}
