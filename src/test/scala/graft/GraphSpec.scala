package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pageRankInt: a ring is a fixed point — every rank stays exactly at scale") {
    // outdeg 1 everywhere: next = 150000 + 85·1000000 div 100 = 1000000
    val n = 10
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(ring, iters = 4).collect()
    assert(ranks.length === n)
    assert(ranks.forall(_.getAs[Long]("rank") === 1000000L))
  }

  test("pageRankInt: hub of a star outranks the leaves, monotonically in iters") {
    val leaves = (1L to 20L)
    val star = leaves.map(l => (l, 0L)).toDF("src", "dst") // all point at hub 0
    def hubRank(iters: Int): Long =
      Graph.pageRankInt(star, iters).filter(col("node") === 0L)
        .head().getAs[Long]("rank")
    val r1 = hubRank(1); val r2 = hubRank(2)
    // after one iteration the hub holds the teleport share + 85% of the
    // 20 leaves' full initial mass; leaves (no in-edges) fall to teleport
    assert(r1 === 150000L + 85L * 20L * 1000000L / 100L)
    // hub rank can only shrink once leaves have dropped to teleport mass,
    // but must stay far above any leaf
    val leafRank = Graph.pageRankInt(star, 2).filter(col("node") === 1L)
      .head().getAs[Long]("rank")
    assert(r2 > leafRank * 10)
    assert(leafRank === 150000L) // dangling hub contributes nothing back
  }

  test("pageRankInt: result is invariant to input partitioning (exact integers)") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60)).filter(t => t._1 != t._2)
    val a = Graph.pageRankInt(edges.toDF("src", "dst").repartition(13), 3)
      .collect().map(_.toString).sorted
    val b = Graph.pageRankInt(edges.toDF("src", "dst").coalesce(1), 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("pageRankInt: static edges read from cache, never recomputed per iteration") {
    val edges = (0L until 200L).map(i => (i, (i * 7 + 3) % 200))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val plan = Graph.pageRankInt(edges, 2, checkpoint = false)
      .queryExecution.executedPlan.toString
    // the edge list is repartitioned on src once and CACHED — every
    // iteration's contrib join scans the in-memory copy (at scale only
    // the rank vector moves); the rank lineage itself is checkpointed
    assert(plan.contains("InMemoryTableScan"),
      s"edges must come from the cached repartitioned copy:\n$plan")
  }

  test("pageRankInt: rejects a damping numerator above the denominator") {
    intercept[IllegalArgumentException](
      Graph.pageRankInt(Seq((1L, 2L)).toDF("src", "dst"), 1, dampNum = 101))
  }

  test("hitsInt: hand-computed star — sinks take authority, pointers take hub mass") {
    import spark.implicits._
    // 1..4 → 0 and 0 → 5: node 0 is the sole authority, 1..4 the hubs;
    // after one round (auths from hubs, hubs from NEW auths):
    //   raw auth: 0 ← 4·scale, 5 ← scale  → norm: 0 = 1e6, 5 = 250000
    //   raw hub:  1..4 ← auth(0) = 1e6, 0 ← auth(5) = 250000
    //             → norm: 1..4 = 1e6, 0 = 250000, 5 = 0 (no out-edges)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 5L))
      .toDF("src", "dst")
    val got = Graph.hitsInt(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("hub"), r.getAs[Long]("auth")))).toMap
    assert(got(0L) === ((250000L, 1000000L)))
    assert(got(5L) === ((0L, 250000L)))
    (1L to 4L).foreach(i => assert(got(i) === ((1000000L, 0L)), s"node $i"))
    // renormalization pins the max of each side to scale every round
    val r3 = Graph.hitsInt(edges, iters = 3).collect()
    assert(r3.map(_.getAs[Long]("hub")).max === 1000000L)
    assert(r3.map(_.getAs[Long]("auth")).max === 1000000L)
    // exact integers ⇒ partitioning-invariant
    val a = Graph.hitsInt(edges.repartition(7), iters = 2)
      .collect().map(_.toString).sorted
    val b = Graph.hitsInt(edges.coalesce(1), iters = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("triangles: K4 counts 3 per node; triangle-free star counts none") {
    // K4: every node sits in C(3,2)=3 triangles; 4 triangles total
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("doc_a", "doc_b")
    val got = Graph.triangles(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // duplicate/reversed input edges must not double-count
    val noisy = k4.unionByName(k4.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val got2 = Graph.triangles(noisy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got, "orientation dedups reversed duplicates")
    // star graph: wedges everywhere, zero closures
    val star = (2L to 6L).map(b => (1L, b)).toDF("doc_a", "doc_b")
    assert(Graph.triangles(star).count() === 0L)
  }
}
