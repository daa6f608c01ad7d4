package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the sparse⊕dense merge a retrieval-augmented
  * training pipeline runs on top of the BM25 (TextAnalysis.bm25TopK)
  * and hash-embedding (TextAnalysis.hashEmbedding) families, plus the
  * contrastive hard-negative miner built from their disagreement.
  *
  * Everything is integer fixed-point: hash-embedding lanes are small
  * signed counts (lossless in float lanes, cast back to long), BM25 is
  * milli-scaled, RRF is micro-scaled — so every ranking hash-verifies
  * against a DuckDB oracle, the engine's exactness contract.
  */
object Retrieval {

  /** Dense retrieval arm: integer dot product between each document's
    * signed hashing-trick embedding and the SAME embedding of the query
    * string — model-free dense scoring (the query rides the identical
    * featurizer, so "semantically near" degrades gracefully to
    * shared-vocabulary-bucket mass).
    *
    * Scale shape: the query vector is a one-row broadcast (cross join
    * with a single-row side); the dot is a narrow codegen'd map over
    * the corpus (`zip_with` + `aggregate`, no UDF); top-k compiles to
    * TakeOrderedAndProject — no global sort ever materializes. The
    * trailing row_number window runs over ≤ k rows.
    */
  def denseTopK(df: DataFrame, queryText: String, k: Int,
                dim: Int = 64, textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = TextAnalysis.hashEmbedding(df, dim, textCol)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"), v => v.cast("long")).as("emb"))
    val qv = TextAnalysis.hashEmbedding(
        Seq((0L, queryText)).toDF("doc_id", textCol), dim, textCol)
      .select(transform(col("embedding"), v => v.cast("long")).as("q_emb"))
    docs.crossJoin(broadcast(qv))
      .withColumn("dot",
        aggregate(zip_with(col("emb"), col("q_emb"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"), col("dot"))
      .orderBy(col("dot").desc, col("doc_id"))
      .limit(k)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(col("dot").desc, col("doc_id"))))
  }

  /** Sparse retrieval arm: BM25 top-k with an explicit 1-based rank
    * among the survivors (rank window over ≤ k rows). */
  def sparseTopK(df: DataFrame, terms: Seq[String], k: Int,
                 textCol: String = "text"): DataFrame =
    TextAnalysis.bm25TopK(df, terms, k, textCol = textCol)
      .withColumn("sparse_rank",
        row_number().over(Window.orderBy(col("score_milli").desc, col("doc_id"))))

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher '09): fused score
    * = Σ_systems 1e6 // (kRrf + rank); a document absent from one
    * system's top-k contributes 0 from it. The standard hybrid merge —
    * immune to the two systems' incomparable score scales, no tuning
    * beyond kRrf. Both inputs are ≤ k-row slivers, so the full-outer
    * join and final rank are trivial at any corpus scale.
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, kRrf: Int = 60,
              topK: Int = 20): DataFrame =
    sparse.select(col("doc_id"), col("sparse_rank"))
      .join(dense.select(col("doc_id"), col("dense_rank")), Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 div ($kRrf + sparse_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($kRrf + dense_rank)"), lit(0L)))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_micro").desc, col("doc_id"))))

  /** Contrastive hard negatives: documents the dense retriever surfaces
    * that the lexical retriever does NOT — semantically near, lexically
    * off-query, exactly the negative set contrastive embedding training
    * wants (DPR/Contriever practice). Anti-join of two ≤ kPool-row
    * slivers; ordering inherited from the dense rank.
    */
  def hardNegatives(df: DataFrame, terms: Seq[String], queryText: String,
                    kPool: Int = 50, k: Int = 20, dim: Int = 64): DataFrame =
    denseTopK(df, queryText, kPool, dim)
      .join(TextAnalysis.bm25TopK(df, terms, kPool).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .orderBy(col("dense_rank"))
      .limit(k)

  /** Retrieval evaluation against the lexical proxy: with the BM25
    * top-`kRel` as the relevance set (the standard no-labels proxy),
    * integer recall@k and MRR for the dense arm and the RRF fusion —
    * the report that says whether fusion is EARNING its extra arm on
    * this corpus. Zero-hit systems report 0s (empty-agg contract: count
    * 0, min NULL → coalesced). All inputs are top-k slivers; the
    * metrics are two ≤ k-row joins.
    */
  /** The shared arm scaffold of every lexical-truth eval
    * ([[evalVsLexical]], [[ndcgAtK]]): the sparse/dense pools, the
    * top-kRel relevance set, and the RRF fusion cut at k — ONE home so
    * the pool-floor rule and relevance convention can't diverge between
    * metrics. Pools must cover the deepest rank any metric reads — a
    * fixed 50 would silently truncate for k > 50. */
  private def lexicalArms(df: DataFrame, terms: Seq[String], queryText: String,
                          kRel: Int, k: Int, dim: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val pool = math.max(50, math.max(k, kRel))
    val sparse = sparseTopK(df, terms, pool)
    val rel = sparse.filter(col("sparse_rank") <= kRel).select(col("doc_id"))
    val dense = denseTopK(df, queryText, pool, dim)
    val rrf = rrfFuse(sparse, dense, topK = k)
    (rel, dense, rrf)
  }

  def evalVsLexical(df: DataFrame, terms: Seq[String], queryText: String,
                    kRel: Int = 10, k: Int = 20, dim: Int = 64): DataFrame = {
    val (rel, dense, rrf) = lexicalArms(df, terms, queryText, kRel, k, dim)
    def metrics(sys: String, top: DataFrame, rankCol: String): DataFrame =
      top.filter(col(rankCol) <= k)
        .join(rel, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"), min(col(rankCol)).as("__first"))
        .select(lit(sys).as("system"), col("n_hits"),
          expr(s"n_hits * 1000000 div $kRel").as("recall_ppm"),
          coalesce(expr("1000000 div __first"), lit(0L)).as("mrr_micro"))
    metrics("dense", dense, "dense_rank")
      .unionByName(metrics("rrf", rrf, "rank"))
  }

  /** DCG rank discounts `1/log₂(i+1)` scaled to integer micro — the
    * plan-time constant table [[ndcgAtK]] and its oracle twin both read,
    * so the transcendental `log` is evaluated ONCE in Scala and never
    * inside either engine (double SUMs would also be
    * partitioning-order-dependent; integer micro sums are exact and
    * associative). */
  def ndcgDiscountsMicro(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1000000.0 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** NDCG@k for the dense and RRF arms against the lexical top-kRel
    * truth set (binary gains — the [[evalVsLexical]] relevance
    * convention): `DCG = Σ_{hits} disc(rank)`, `IDCG = Σ_{i≤min(k,kRel)}
    * disc(i)`, both in exact integer micro via [[ndcgDiscountsMicro]];
    * the ratio reports in ppm by integer division. Rank-aware where
    * recall@k is rank-blind — a system that buries its hits at rank k
    * scores visibly worse than one that fronts them.
    *
    * Scale shape: identical to evalVsLexical — all inputs are top-pool
    * slivers, the metrics are ≤ k-row joins; the discount lookup is a
    * literal CASE chain over a config-sized k.
    */
  def ndcgAtK(df: DataFrame, terms: Seq[String], queryText: String,
              kRel: Int = 10, k: Int = 10, dim: Int = 64): DataFrame = {
    require(k >= 1 && kRel >= 1, "ndcgAtK: k and kRel must be positive")
    val (rel, dense, rrf) = lexicalArms(df, terms, queryText, kRel, k, dim)
    val disc = ndcgDiscountsMicro(k)
    val idcg = disc.take(math.min(k, kRel)).sum
    def discOf(rankCol: String): Column =
      disc.zipWithIndex.foldLeft(lit(0L)) { case (acc, (d, i)) =>
        when(col(rankCol) === (i + 1), lit(d)).otherwise(acc)
      }
    def m(sys: String, top: DataFrame, rankCol: String): DataFrame =
      top.filter(col(rankCol) <= k)
        .join(rel, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"),
          coalesce(sum(discOf(rankCol)), lit(0L)).as("dcg_micro"))
        .select(lit(sys).as("system"), col("n_hits"), col("dcg_micro"),
          lit(idcg).as("idcg_micro"),
          expr(s"(dcg_micro * 1000000) div $idcg").as("ndcg_ppm"))
    m("dense", dense, "dense_rank").unionByName(m("rrf", rrf, "rank"))
  }

  /** The classical rank-eval quartet at k — MRR, Precision@k, Recall@k,
    * AP@k — for the dense and RRF arms against the lexical truth set
    * (same harness and relevance convention as [[ndcgAtK]]; together
    * they are the standard IR eval card). All integer-exact: reciprocal
    * rank and per-hit precision terms are single integer divisions
    * (`1e6 div r`, `hit_idx·1e6 div r` — hit_idx IS the hit count at
    * rank r), AP divides the term sum once by min(k, kRel). The hit
    * frames are ≤ k rows, so the ordering window is k-bounded — never
    * data-sized.
    */
  def rankEvalAtK(df: DataFrame, terms: Seq[String], queryText: String,
                  kRel: Int = 10, k: Int = 10, dim: Int = 64): DataFrame = {
    require(k >= 1 && kRel >= 1, "rankEvalAtK: k and kRel must be positive")
    val (rel, dense, rrf) = lexicalArms(df, terms, queryText, kRel, k, dim)
    val denom = math.min(k, kRel)
    def m(sys: String, top: DataFrame, rankCol: String): DataFrame = {
      val hits = top.filter(col(rankCol) <= k)
        .join(rel, Seq("doc_id"), "left_semi")
        .select(col(rankCol).cast("long").as("r"))
        .withColumn("hit_idx",
          row_number().over(Window.orderBy(col("r"))).cast("long"))
      hits.agg(
          count(lit(1)).as("n_hits"),
          coalesce(min(col("r")), lit(0L)).as("__first"),
          coalesce(sum(expr("(hit_idx * 1000000) div r")), lit(0L)).as("__ap_sum"))
        .select(lit(sys).as("system"),
          col("n_hits"),
          expr("CASE WHEN __first > 0 THEN 1000000 div __first ELSE 0L END")
            .as("mrr_micro"),
          expr(s"(n_hits * 1000000) div $k").as("p_at_k_ppm"),
          expr(s"(n_hits * 1000000) div $kRel").as("recall_ppm"),
          expr(s"__ap_sum div $denom").as("ap_micro"))
    }
    m("dense", dense, "dense_rank").unionByName(m("rrf", rrf, "rank"))
  }

  /** Late-interaction retrieval (the ColBERT MaxSim operator, Khattab &
    * Zaharia 2020, on model-free parts): documents are split into fixed
    * `chunkTokens`-token windows, each window hash-embedded; each query
    * unit is hash-embedded the same way; and
    * `score(q, d) = Σ_{u ∈ q} max_{c ∈ d} ⟨emb(u), emb(c)⟩` — the sum
    * over query units of their best-matching chunk. This is what makes
    * long documents retrievable by a local passage instead of being
    * averaged into mush (the single-vector failure mode of
    * [[denseTopK]]).
    *
    * Integer-exact: embeddings are signed counts, dots are long sums —
    * every ranking hash-verifies. Scale shape: chunking is a per-row
    * HOF (no token explode); the query side is a ≤|q|-row broadcast;
    * max-per-(doc,unit) and sum-per-doc are partial aggs that collapse
    * map-side (chunks of a doc co-reside after posexplode); top-k is
    * TakeOrderedAndProject. Nothing shuffles at corpus width except
    * the two keyed aggregates.
    */
  def maxSimTopK(df: DataFrame, queryUnits: Seq[String], k: Int,
                 chunkTokens: Int = 8, dim: Int = 64,
                 textCol: String = "text"): DataFrame = {
    require(queryUnits.nonEmpty, "maxSimTopK: queryUnits must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val chunks = df.select(col("doc_id"),
        expr(s"transform(sequence(0, (size(split($textCol, ' ')) - 1) div $chunkTokens), " +
          s"i -> array_join(slice(split($textCol, ' '), i * $chunkTokens + 1, $chunkTokens), ' '))")
          .as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        transform(graft.functions.TextFunctions.hash_embed(
          split(col("chunk"), " "), dim), v => v.cast("long")).as("c_emb"))
    val qdf = queryUnits.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("unit_id", "unit")
      .select(col("unit_id"),
        transform(graft.functions.TextFunctions.hash_embed(
          split(col("unit"), " "), dim), v => v.cast("long")).as("q_emb"))
    chunks.crossJoin(broadcast(qdf))
      .withColumn("dot",
        aggregate(zip_with(col("c_emb"), col("q_emb"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .groupBy(col("doc_id"), col("unit_id"))
      .agg(max(col("dot")).as("maxsim"))
      .groupBy(col("doc_id"))
      .agg(sum(col("maxsim")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
  }
}
