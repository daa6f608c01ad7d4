package graft

import graft.ops.{Dedup, Retrieval, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hybrid retrieval (RRF) + hard-negative mining + split-leakage
  * invariants — the retrieval glue over the BM25/hash-embedding arms. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "hash join vector hash join vector"), // lexically + densely on-query
    (2L, "hash join filter scan"),             // partial lexical hit
    (3L, "vector vector vector vector"),       // single-term heavy
    (4L, "sort merge window batch"),           // off-query entirely
    (5L, "hash join vector"),                  // exact query text
    (6L, "table scan filter predicate")        // off-query
  ).toDF("doc_id", "text")

  test("denseTopK ranks the exact-query document above off-query ones") {
    val top = Retrieval.denseTopK(corpus, "hash join vector", 6)
      .orderBy(col("dense_rank")).collect()
    val rankOf = top.map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(rankOf(1L) < rankOf(4L), "on-query doc must beat off-query doc")
    assert(rankOf(5L) < rankOf(4L))
    // dot of the exact-query doc equals the query's self-dot (same featurizer)
    val dotOf = top.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dotOf(1L) === 2 * dotOf(5L), "doc 1 is the query text twice — double mass, double dot")
  }

  test("rrfFuse: present-in-both beats present-in-one at equal ranks") {
    val sparse = Seq((10L, 1), (11L, 2)).toDF("doc_id", "sparse_rank")
    val dense = Seq((10L, 2), (12L, 1)).toDF("doc_id", "dense_rank")
    val fused = Retrieval.rrfFuse(sparse, dense, kRrf = 60, topK = 10)
      .orderBy(col("rank")).collect()
    assert(fused.head.getLong(0) === 10L, "doc in both systems wins")
    // exact integer contract: 1e6 div 61 + 1e6 div 62
    assert(fused.head.getAs[Long]("rrf_micro") ===
      1000000L / 61 + 1000000L / 62)
    // absent side contributes exactly 0
    val doc12 = fused.find(_.getLong(0) == 12L).get
    assert(doc12.getAs[Long]("rrf_micro") === 1000000L / 61)
  }

  test("hardNegatives is disjoint from the sparse arm and dense-ordered") {
    val hn = Retrieval.hardNegatives(corpus,
      Seq("hash", "join", "vector"), "hash join vector", kPool = 3, k = 5)
    val sparseIds = TextAnalysis.bm25TopK(corpus, Seq("hash", "join", "vector"), 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hnRows = hn.collect()
    assert(hnRows.forall(r => !sparseIds.contains(r.getLong(0))),
      "hard negatives must not appear in the sparse top-k")
    val ranks = hnRows.map(_.getAs[Int]("dense_rank"))
    assert(ranks.sameElements(ranks.sorted), "ordered by dense rank")
  }

  test("content-keyed splits: exact duplicates can never cross splits") {
    // two byte-identical docs under different ids — the leakage the
    // content-keyed FNV split makes structurally impossible
    val dup = Seq((100L, "aaa bbb ccc ddd"), (200L, "aaa bbb ccc ddd"))
      .toDF("doc_id", "text")
    val splits = Sampling.assignSplits(dup).select("split").distinct().count()
    assert(splits === 1, "identical content must hash to one split")
  }

  test("split_leakage surfaces a planted near-dup crossing the boundary") {
    // two near-identical docs (one token differs mid-text) that land in
    // different content-hash splits — found by scanning token edits
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val variants = (1 to 200).map { v =>
      (v.toLong, base.replace(" w20 ", s" v$v "))
    }
    val all = (variants :+ (0L, base)).toDF("doc_id", "text")
    val withSplit = Sampling.assignSplits(all)
    val baseSplit = withSplit.filter(col("doc_id") === 0).select("split").head.getString(0)
    val crosser = withSplit.filter(col("split") =!= baseSplit).limit(1).collect()
    assume(crosser.nonEmpty, "needs at least one variant in another split")
    val pair = Seq((0L, base), (crosser(0).getAs[Long]("doc_id"),
      crosser(0).getAs[String]("text"))).toDF("doc_id", "text")
    val splits = Sampling.assignSplits(pair).select(col("doc_id"), col("split"))
    val leaks = Dedup.minhashLshPairs(pair)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaks.count() === 1, "the planted cross-split near-dup must surface")
  }

  test("ndcgAtK: discount table is the DCG ladder, metrics respect the idcg bound") {
    val d = Retrieval.ndcgDiscountsMicro(10)
    assert(d.head === 1000000L, "rank 1 discount is 1/log2(2) = 1 exactly")
    assert(d === d.sortBy(-_), "discounts must decrease with rank")
    assert(d.last === 289065L, "1e6/log2(11) — pins the constant table")
    val rows = Retrieval.ndcgAtK(Tables.documents(spark, sf001),
        Seq("hash", "join", "vector"), "hash join vector")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("dense", "rrf"))
    rows.values.foreach { r =>
      val dcg = r.getAs[Long]("dcg_micro"); val idcg = r.getAs[Long]("idcg_micro")
      assert(idcg === d.sum)
      assert(dcg >= 0L && dcg <= idcg, "DCG can never exceed the ideal ordering's")
      assert(r.getAs[Long]("ndcg_ppm") === dcg * 1000000L / idcg)
      assert(r.getAs[Long]("n_hits") <= 10L)
    }
  }

  test("denseTopK plan: top-k compiles to TakeOrderedAndProject, no global sort") {
    val plan = Retrieval.denseTopK(corpus, "hash join vector", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k physical operator, got:\n$plan")
  }

  test("assignSplitsByCluster eliminates cross-split near-dup leakage") {
    val docs = Tables.documents(spark, sf01)
    val pairs = Dedup.minhashLshPairs(docs).cache()
    val splits = Sampling.assignSplitsByCluster(docs, pairs)
      .select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(leaks === 0,
      "cluster-keyed splits must leave zero near-dup pairs across the boundary")
    // and the split ratio stays roughly content-hash-shaped (train ≈ 80%)
    val n = splits.count()
    val train = splits.filter(col("split") === "train").count()
    assert(train * 100 >= n * 70 && train * 100 <= n * 90)
  }

  test("maxSimTopK: a local passage beats a diluted full-doc match") {
    import spark.implicits._
    // doc 1: the query phrase sits in ONE chunk of an otherwise-noisy
    // long doc; doc 2 scatters the query words across chunks so no
    // single chunk concentrates them; doc 3 is noise
    val noise = (1 to 24).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$noise alpha beta gamma delta $noise"),
      (2L, s"alpha $noise beta $noise gamma"),
      (3L, s"$noise $noise")).toDF("doc_id", "text")
    val got = graft.ops.Retrieval.maxSimTopK(
        docs, Seq("alpha beta gamma delta"), k = 3, chunkTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("rank")).toMap
    assert(got(1L) === 1, "doc with the concentrated passage ranks first")
    assert(got(1L) < got(2L) && got(2L) < got(3L))
    // deterministic under repartition (integer dots, total-order ties)
    val again = graft.ops.Retrieval.maxSimTopK(
        docs.repartition(5), Seq("alpha beta gamma delta"), k = 3, chunkTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("rank")).toMap
    assert(again === got)
  }

  test("madOutliers: planted outlier flagged, median/MAD immune to it") {
    import spark.implicits._
    // 7 values: 8,10,10,10,12,12 + one planted 500. Lower median (rank
    // (7+1) div 2 = 4 of the sorted values) = 10; deviations sorted are
    // 0,0,0,2,2,2,490 → MAD (rank 4) = 2; only 490 > 3·MAD flags
    val rows = Seq(8L, 10L, 10L, 10L, 12L, 12L, 500L).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }
    val df = rows.toDF("source", "doc_id", "n_chars")
    val r = graft.ops.Profile.madOutliers(df, "n_chars", k = 3).head()
    assert(r.getAs[Long]("median") === 10L)
    assert(r.getAs[Long]("mad") === 2L, "dev ranks 0,0,0,2,2,2,490 → rank-4 = 2")
    assert(r.getAs[Long]("n_outliers") === 1L, "only the planted 500 exceeds 3·MAD")
    assert(r.getAs[Long]("worst_value") === 500L)
    // a mean/stddev gate at the same k would have been dragged by the
    // outlier itself: mean ≈ 80, σ ≈ 171 → 500 < mean + 3σ — NOT flagged
    val mean = rows.map(_._3).sum.toDouble / rows.length
    val sd = math.sqrt(rows.map(v => math.pow(v._3 - mean, 2)).sum / rows.length)
    assert(500 < mean + 3 * sd, "the contrast case: z-score gate misses it")
  }
}
