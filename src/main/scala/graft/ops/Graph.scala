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
      .union(e.select(col("dst").as("node"))).distinct()
    val teleport = scale * (dampDen - dampNum) / dampDen
    // rank(u) is a pure function of the in-sum: rank = teleport +
    // (dampNum·s) div dampDen, with s absent → 0 (and rank₀ = scale).
    // Folding that into the contribution projection keeps the all-nodes
    // rank vector OUT of the loop: per iteration only the src-keyed sum
    // table joins the (cached, src-partitioned) edges — the per-round
    // |nodes| join + exchange of the old form is gone (guide §2.4), and
    // the full vector materializes exactly once, at the end.
    val eo = e.join(out, "src")
    val rankExpr =
      s"(cast($teleport as bigint) + ($dampNum * coalesce(s, cast(0 as bigint))) div $dampDen)"
    var sums: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val contribs = sums match {
        case None => // iteration 1: every node holds rank₀ = scale
          eo.select(col("dst").as("node"),
            expr(s"cast($scale as bigint) div outdeg").as("contrib"))
        case Some(sm) =>
          eo.join(sm.withColumnRenamed("node", "src"), Seq("src"), "left")
            .select(col("dst").as("node"),
              expr(s"$rankExpr div outdeg").as("contrib"))
      }
      val next = contribs.groupBy("node").agg(sum(col("contrib")).as("s"))
      sums = Some(if (checkpoint) next.localCheckpoint(eager = false) else next)
    }
    sums match {
      case None => nodes.withColumn("rank", lit(scale))
      case Some(sm) =>
        nodes.join(sm, Seq("node"), "left")
          .select(col("node"), expr(rankExpr).as("rank"))
    }
  }

  /** HITS hubs & authorities (Kleinberg 1999) in integer fixed point —
    * the link-graph companion to [[pageRankInt]] for corpus weighting:
    * authority mass says "many good hubs point here" (the page worth
    * boosting in a training mix), hub mass says "this page points at
    * good authorities" (the link-farm/directory signal worth DAMPING).
    * Synchronous updates, standard order (auths from hubs, then hubs
    * from the NEW auths); each half-step renormalizes by the max via
    * integer division to `scale` — deterministic and
    * partitioning-invariant where float L2 normalization would not be.
    *
    * Scale shape: the pageRankInt posture — static edges repartitioned
    * once on src and cached (ReusedExchange across all iterations), per
    * iteration two keyed partial aggs + two broadcast-max scalars, the
    * score vectors are |nodes|-sized, lineage cut per half-step.
    * Magnitude bound: raw mass ≤ max-degree·scale, renormalized before
    * the next multiply — `scale²·degree` must stay inside i64 (at
    * scale 10⁶ that allows degree ≈ 10⁶; shrink scale for denser hubs).
    */
  def hitsInt(edges: DataFrame, iters: Int, scale: Long = 1000000L,
              checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1 && scale > 0, s"hitsInt: bad iters=$iters scale=$scale")
    val e = edges.select(col("src"), col("dst")).repartition(col("src")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // Loop state carries ONLY nodes that hold mass: a node absent from a
    // score table contributes exactly what an explicit 0 row would to
    // every downstream sum and max (mass is non-negative), so the
    // all-nodes left-join + exchange the old form paid TWICE per round
    // (guide §2.4) is deferred to one final join. Initial hubs = scale
    // on every node, but only out-edge sources are ever read by the
    // auth update — so the init table is src-distinct, not all-nodes.
    // Update order unchanged: auths from hubs, then hubs from NEW auths;
    // renormalization stays the 1-row broadcast max.
    var hubs = e.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(scale))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("raw"))
      val aMax = aRaw.agg(max(col("raw")).as("__m"))
      val aNext = aRaw.crossJoin(broadcast(aMax))
        .select(col("node"), expr(s"(raw * $scale) div __m").as("auth"))
      auths = if (checkpoint) aNext.localCheckpoint(eager = false) else aNext
      val hRaw = e.join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("raw"))
      val hMax = hRaw.agg(max(col("raw")).as("__m"))
      val hNext = hRaw.crossJoin(broadcast(hMax))
        .select(col("node"), expr(s"(raw * $scale) div __m").as("hub"))
      hubs = if (checkpoint) hNext.localCheckpoint(eager = false) else hNext
    }
    nodes.join(hubs, Seq("node"), "left").join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** Exact triangle count + per-node triangle participation — the
    * standard QA metric for a near-dup pair graph (a clean dedup graph
    * is triangle-dense inside clusters and triangle-free across them;
    * a sudden triangle-rate drop means the banding/threshold regressed).
    *
    * Canonical-orientation algorithm (each triangle counted ONCE): edges
    * are normalized to `a < b`, then two equi-joins close the wedge —
    * (a,b)⋈(b,c) gives paths a<b<c, and a semi-check against (a,c)
    * confirms closure. Both joins are keyed shuffles on node ids; the
    * degree-ordered orientation is the classical bound on wedge fan-out
    * (a high-degree hub only generates wedges toward HIGHER-degree
    * nodes, so hot keys cap at O(√|E|) wedges — Schank/Wagner 2005,
    * the MapReduce-era standard for web-scale graphs).
    *
    * Output: one row per participating node `(node, n_triangles)` plus
    * the caller can sum for the global count. Nodes in no triangle are
    * absent (join-back is the caller's choice).
    */
  def triangles(pairs: DataFrame): DataFrame = {
    // degree-ordered orientation: direct every edge from the LOWER
    // (degree, id) endpoint to the higher — the fan-out bound above
    val und = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct()
    val deg = und.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .filter(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("a"), col("v").as("b"))
    val wedges = oriented.as("e1").join(
        oriented.select(col("a").as("b"), col("b").as("c")).as("e2"), "b")
      .select(col("a"), col("b"), col("c"))
    val tri = wedges.join(
        oriented.select(col("a"), col("b").as("c")), Seq("a", "c"), "leftsemi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
