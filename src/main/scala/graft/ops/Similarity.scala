package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `Array[Float]` embedding column.
  *
  * Numeric discipline: dot products are a *sequential left fold* in
  * double precision (`aggregate(zip_with(...))`) — deterministic IEEE
  * result, bit-identical to an oracle that folds the same way (DuckDB
  * `list_reduce`), unlike SUM-over-unnest whose order is engine-defined.
  *
  * Scale stance: brute-force top-k is the small-query-set baseline
  * (k queries × corpus is a broadcast map-side compute, no shuffle);
  * `lshCosinePairs` is the 100 TB path — sign-random-projection buckets
  * turn all-pairs into an equi-join.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns. Uses the
    * codegen'd kernel (graft.functions.FloatVecDot) — identical fold
    * semantics to `aggregate(zip_with(...))` but ~20× faster: Spark's
    * higher-order functions interpret their lambdas per element.
    */
  def dot(a: String, b: String): Column =
    graft.functions.VecFunctions.vec_dot(col(a), col(b))

  def l2Norm(a: String): Column =
    sqrt(graft.functions.VecFunctions.vec_norm2(col(a)))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Query side is small ⇒ broadcast it; the corpus scan
    * stays embarrassingly parallel and the only shuffle is the per-query
    * top-k (tiny after the window filter).
    *
    * `zeroNormSentinel`: a zero-norm vector's cosine is 0/0 = NaN, whose
    * sort placement is engine-implementation-defined. Callers whose
    * inputs can legitimately produce zero vectors (e.g. Matryoshka
    * prefix truncation) pass `Some(s)` to pin that cosine to the
    * sentinel on BOTH engines; `None` keeps the raw expression for the
    * established oracle twins whose inputs are norm-checked upstream.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 zeroNormSentinel: Option[Double] = None): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2Norm("embedding").as("qnorm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      l2Norm("embedding").as("cnorm"))
    val rawCos = dot("qe", "ce") / (col("qnorm") * col("cnorm"))
    val cosExpr = zeroNormSentinel match {
      case Some(s) => when(col("qnorm") * col("cnorm") === 0d, lit(s)).otherwise(rawCos)
      case None    => rawCos
    }
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosExpr.as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * per query, greedily pick `k` results trading relevance against
    * redundancy — pick i maximizes `λ·rel(q,c) − (1−λ)·max_{s∈picked}
    * sim(c,s)` (the first pick has an empty picked set; its diversity
    * term is 0). The training-data reading: diversified eval/demo-set
    * selection from a near-duplicate-heavy corpus, where plain top-k
    * returns k copies of the same document.
    *
    * Determinism: relevance and pair similarity use the sequential-fold
    * cosine ([[dot]]), the score is ONE fixed-order double expression
    * (`λ·rel − (1−λ)·maxsim`, λ = lambdaMicro/10⁶ — both factors are
    * correctly-rounded doubles, so the oracle's decimal literals parse
    * to the identical IEEE values), and argmax ties break to the
    * smallest candidate id — the oracle replays the greedy bit-exactly.
    *
    * Scale shape: MMR is inherently O(candidates·k) per query, so the
    * operator is two-stage by construction — candidates are first cut
    * to the top-`preselect` by relevance (the classic retrieve-then-
    * rerank geometry; at 100 TB the first stage is the ANN index, not
    * this window). The cut frame (queries × preselect rows) is
    * localCheckpoint'd once: every greedy round references it without
    * re-scanning the corpus, and each round is an anti-join + a
    * broadcast join against the ≤ queries·k picked rows — no shuffle
    * grows with the corpus after the cut.
    */
  def mmrSelect(queries: DataFrame, corpus: DataFrame, k: Int,
                lambdaMicro: Long = 700000L, preselect: Int = 100): DataFrame = {
    require(k >= 1 && k <= 64, s"mmr: k=$k out of [1,64]")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"mmr: lambdaMicro=$lambdaMicro out of [0, 1000000]")
    require(preselect >= k, s"mmr: preselect=$preselect must be >= k=$k")
    val lam = lambdaMicro.toDouble / 1000000.0
    val oneMinusLam = (1000000L - lambdaMicro).toDouble / 1000000.0
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2Norm("embedding").as("qnorm"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
      l2Norm("embedding").as("cnorm"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand_id").asc)
    val cands = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot("qe", "ce") / (col("qnorm") * col("cnorm"))).as("rel"),
        col("ce"), col("cnorm"))
      .withColumn("__rn", row_number().over(wRel))
      .filter(col("__rn") <= preselect).drop("__rn")
      // one eager materialization of the tiny cut frame: the k greedy
      // rounds each reference it — without this the corpus scan and
      // preselect window would replay once per round
      .localCheckpoint()
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    def pick(scored: DataFrame, rank: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("cand_id").as("sel_id"), lit(rank).as("rank"),
        col("score"), col("ce").as("se"), col("cnorm").as("snorm"))
    var selected = pick(
      cands.withColumn("score", lit(lam) * col("rel") - lit(oneMinusLam) * lit(0.0d)), 1)
    for (i <- 2 to k) {
      val selSlim = selected.select(col("query_id"), col("sel_id"), col("se"), col("snorm"))
      val remaining = cands.join(
        selSlim.select(col("query_id"), col("sel_id").as("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      val maxSim = remaining.join(broadcast(selSlim), Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          (dot("ce", "se") / (col("cnorm") * col("snorm"))).as("sim"))
        .groupBy(col("query_id"), col("cand_id")).agg(max(col("sim")).as("maxsim"))
      val scored = remaining.join(maxSim, Seq("query_id", "cand_id"))
        .withColumn("score", lit(lam) * col("rel") - lit(oneMinusLam) * col("maxsim"))
      // cut the lineage every round: selected_{i-1} is referenced three
      // times when building selected_i (anti-join, maxsim, union), so
      // an un-checkpointed loop grows the plan TREE 3^k-fold and hangs
      // Catalyst analysis long before k reaches the allowed 64
      selected = selected.unionByName(pick(scored, i)).localCheckpoint()
    }
    selected.select(col("query_id"), col("rank"), col("sel_id").as("selected_id"),
      col("score"))
  }

  /** Deterministic sign-random-projection hyperplanes (xorshift64*,
    * plan-time constants). Public so the oracle SQL can embed the SAME
    * values — one generator, two engines. */
  def lshPlanes(dim: Int, nPlanes: Int = 8, seed: Long = 42L): Array[Array[Float]] = {
    var s = seed
    def next(): Float = { // xorshift64*: top 53 bits / 2^52 ∈ [0,2) → [-1,1)
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      (((s * 2685821657736338717L) >>> 11).toDouble / 4.503599627370496e15 - 1.0).toFloat
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-random-projection LSH (Charikar '02): bucket = sign bits of
    * dot(v, plane_j) for `nPlanes` deterministic pseudo-random planes.
    * Same-bucket vectors are cosine candidates; all-pairs becomes an
    * equi-join on the bucket key.
    */
  def lshBucketKey(embCol: String, dim: Int, nPlanes: Int = 8, seed: Long = 42L): Column = {
    val planes = lshPlanes(dim, nPlanes, seed)
    val bits = (0 until nPlanes).map { j =>
      when(graft.functions.VecFunctions.vec_dot(col(embCol), typedLit(planes(j))) > 0,
        expr(s"CAST(1 AS BIGINT) << $j")).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF (inverted-file) ANN — the second scale path besides LSH:
    * a coarse quantizer of `k` deterministic centroids (seeded sample of
    * the corpus — stand-in for a k-means fit, which would be an offline
    * job at 100 TB); every vector is assigned to its nearest centroid
    * (the inverted lists); a query probes only the `nProbe` nearest
    * lists. All-pairs becomes an equi-join on centroid id; list sizes
    * are corpus/k on average, so probe cost is nProbe/k of brute force.
    */
  /** All `k` centroids folded into ONE row holding an
    * `array<struct{centroid_id, centroid, cnorm}>` — the broadcastable
    * quantizer. `coalesce(1)` (narrow) feeds the global `collect_list`
    * from a single partition, so no Exchange appears anywhere in the
    * centroid sub-plan either.
    */
  private def centroidArray(centroids: DataFrame): DataFrame =
    centroids.coalesce(1).agg(collect_list(struct(
      col("centroid_id"), col("centroid"), l2Norm("centroid").as("cnorm"))).as("cents"))

  /** A few distributed Lloyd iterations for the IVF coarse quantizer:
    * deterministic init (lowest-id k vectors), assignment via the same
    * shuffle-free broadcast-array argmax as [[ivfAssign]], update = one
    * element-wise mean aggregation (posexplode → per-(centroid,dim)
    * EXACT fixed-point mean → re-assemble; two shuffles per round over
    * k×dim tiny rows after partial aggs). Clusters that go empty keep
    * their previous centroid (the standard k-means fallback). At 100 TB
    * this runs as an offline job over a sample; the operator shape is
    * the same.
    *
    * Means are EXACT: components quantized to integer micros
    * (`floor(v·10⁶ + 0.5)` — pure IEEE ops), summed as BIGINT (order-
    * independent), divided once in double, cast to float. A float/double
    * `avg` would make the fitted centroids depend on partition count and
    * reduction order — i.e. a DIFFERENT quantizer per cluster layout —
    * whereas this form is bit-reproducible on any engine and any
    * partitioning, which is what lets every fitted-default query keep a
    * DuckDB hash oracle.
    */
  /** `fitSampleMod > 1` fits the quantizer on the deterministic
    * `pmod(vec_id, mod) = 0` slice — the standard 100 TB posture (Lloyd
    * rounds over a sample, assignment over everything); the sample
    * predicate is engine-neutral, so sampled fits stay hash-verifiable.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int = 3,
                      fitSampleMod: Int = 1): DataFrame = {
    require(fitSampleMod >= 1, s"kmeans: fitSampleMod=$fitSampleMod must be >= 1")
    val fitOn =
      if (fitSampleMod == 1) corpus
      else corpus.filter(pmod(col("vec_id"), lit(fitSampleMod.toLong)) === 0)
    var centroids = fitOn.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val lists = ivfAssignWith(fitOn, centroids)
      val means = lists
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(
          sum(floor(col("v").cast("double") * 1000000.0d + 0.5d).cast("long")).as("ms"),
          count(lit(1)).as("n"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
            (col("ms").cast("double") / (col("n").cast("double") * 1000000.0d))
              .cast("float").as("m")))),
          s => s.getField("m")).as("mean"))
      centroids = centroids.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("mean"), col("centroid")).as("centroid"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Shuffle-free nearest-centroid assignment against a given quantizer
    * (the argmax core of [[ivfAssign]]). */
  def ivfAssignWith(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignWithSim(corpus, centroids).drop("centroid_sim")

  /** [[ivfAssignWith]] plus the winning cosine itself (`centroid_sim`) —
    * consumers like SemDeDup rank within a cluster by distance to the
    * centroid, and recomputing the argmax's own value downstream would
    * mean a second broadcast pass. Same zero-Exchange plan shape.
    */
  def ivfAssignWithSim(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignKeepAll(corpus, centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"), col("centroid_sim"))

  /** Assignment that PRESERVES every input column (plus `centroid_id` /
    * `centroid_sim`) — the form streaming consumers need, since a
    * narrowing projection would force a join-back against the stream.
    * Same zero-Exchange broadcast-argmax plan. */
  def ivfAssignKeepAll(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroidArray(centroids)))
      // the row's own norm is hoisted OUT of the k-element lambda:
      // `transform` lambdas evaluate interpreted (per element), so an
      // inline l2Norm re-ran the 64-float fold k times per row — same
      // double ops once, identical quotient bits (guide §4: cut work
      // inside the non-codegen hot path before anything else)
      .withColumn("__enorm", l2Norm("embedding"))
      .withColumn("best", array_max(transform(col("cents"), c =>
        struct(
          (graft.functions.VecFunctions.vec_dot(col("embedding"), c.getField("centroid")) /
            (col("__enorm") * c.getField("cnorm"))).as("sim"),
          (-c.getField("centroid_id")).as("negid")))))
      .withColumn("centroid_id", -col("best.negid"))
      .withColumn("centroid_sim", col("best.sim"))
      .drop("cents", "best", "__enorm")

  def ivfAssign(corpus: DataFrame, k: Int): (DataFrame, DataFrame) = {
    // deterministic coarse centroids: lowest-id k vectors. orderBy+limit
    // compiles to TakeOrderedAndProject (per-partition top-k heap merged
    // on the driver, O(n) scan) — NOT a global sort shuffle; k items is
    // all that ever crosses the wire.
    val centroids = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    // Assignment is a per-row argmax over the broadcast centroid array:
    // a BroadcastNestedLoopJoin against ONE row, then a fold — the corpus
    // never shuffles (the old form shuffled corpus×k rows through a
    // window just to take rank 1). `array_max` over struct{sim, -id}
    // picks highest sim, then lowest centroid_id on ties — identical to
    // the former ORDER BY sim DESC, centroid_id.
    (centroids, ivfAssignWith(corpus, centroids))
  }

  /** Per-list member counts above the balance cap, as `centroid_id →
    * number of sub-lists to split into`. Exact sizes from one narrow
    * count pass (k rows back to the driver — the same documented-eager
    * stance as bloomPrune's sizing count; the pass it protects against
    * is the quadratic/hot-key JOIN, which dwarfs one partial-agg scan).
    * Empty map = every list is within `balanceFactor × n/k` and the
    * caller should join unsalted (zero overhead on balanced data).
    */
  private[graft] def listSaltCounts(assigned: DataFrame, nLists: Int,
      balanceFactor: Double): Map[Long, Int] = {
    if (balanceFactor <= 0) return Map.empty
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n")).collect()
    val total = sizes.iterator.map(_.getAs[Number]("n").longValue).sum
    val cap = math.max(1L, (balanceFactor * total / math.max(nLists, 1)).toLong)
    val hot = sizes.iterator
      .filter(_.getAs[Number]("n").longValue > cap)
      .map { r =>
        val n = r.getAs[Number]("n").longValue
        r.getAs[Number]("centroid_id").longValue ->
          math.ceil(n.toDouble / cap).toInt
      }.toMap
    if (hot.nonEmpty) {
      val worst = sizes.iterator.map(_.getAs[Number]("n").longValue).max
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ivf balance guard: ${hot.size}/${sizes.length} inverted lists exceed " +
          s"cap=$cap (worst=$worst); salt-splitting hot lists " +
          s"(quantizer skew — consider more kmeans iterations or higher nLists)")
    }
    hot
  }

  /** Probe join with the inverted-list BALANCE GUARD: lists above
    * `balanceFactor × n/k` members are split into hash sub-lists
    * (`salt = hash(vec_id) mod nSalt`) and probes explode every sub-list
    * of a probed centroid — the candidate set, and therefore every
    * downstream ranking, is IDENTICAL to the unsalted join (oracles
    * unaffected); only the physical join-key cardinality changes, so
    * the largest task is bounded by the cap instead of the hottest list
    * (the skewed-quantizer failure mode at 100 TB). Balanced data takes
    * the plain-join path untouched.
    */
  private def joinProbedLists(lists: DataFrame, probes: DataFrame,
      nLists: Int, balanceFactor: Double): DataFrame = {
    // the sizing pass is eager, so the assignment would otherwise run
    // twice (sizes + join) — pin it once; the guard's whole premise is
    // that the assignment scan is the dominant cost worth protecting
    val pinned = if (balanceFactor > 0) lists.localCheckpoint(true) else lists
    val salts = listSaltCounts(pinned, nLists, balanceFactor)
    if (salts.isEmpty) pinned.join(probes, Seq("centroid_id"))
    else {
      val nSalt = coalesce(element_at(typedLit(salts), col("centroid_id")), lit(1))
        .cast("long")
      val l = pinned.withColumn("__salt", pmod(xxhash64(col("vec_id")), nSalt))
      val p = probes.withColumn("__salt",
        explode(sequence(lit(0L), nSalt - lit(1L))))
      l.join(p, Seq("centroid_id", "__salt")).drop("__salt")
    }
  }

  /** The IVF coarse quantizer + assignment for a given fit depth:
    * `kmeansIters <= 0` → the seeded lowest-id quantizer (the SQL-
    * trivial baseline), else the FITTED exact-mean kmeans — the default
    * everywhere, because on real (non-uniform) data seed centroids
    * produce skewed inverted lists and every within-list join or probe
    * inherits that skew. */
  private def quantize(corpus: DataFrame, nLists: Int,
      kmeansIters: Int, fitSampleMod: Int = 1): (DataFrame, DataFrame) =
    if (kmeansIters <= 0) ivfAssign(corpus, nLists)
    else {
      val fitted = kmeansCentroids(corpus, nLists, kmeansIters, fitSampleMod)
      (fitted, ivfAssignWith(corpus, fitted))
    }

  /** Quantizer balance report — the observability half of the list-size
    * balance guard: per inverted list its member count, corpus share in
    * ppm, and cohesion stats over the winning cosine (micro-rounded to
    * integers so BIGINT sums stay order-free and hash-verifiable; a
    * float sum would depend on partitioning). `share_ppm` far above
    * `10⁶/k` on some list is exactly the skew that makes every
    * within-list join or probe quadratic in the hot list — this is the
    * report an operator reads BEFORE committing a quantizer to a 100 TB
    * run (then fixes with more Lloyd rounds, higher k, or lets the salt
    * guard absorb it). One assignment scan (zero-Exchange broadcast
    * argmax), one groupBy over k keys, a broadcast single-row total.
    * Lists that captured no vectors don't appear (count 0 — same in any
    * engine replicating the argmax).
    */
  def ivfBalance(corpus: DataFrame, nLists: Int = 16, kmeansIters: Int = 2,
                 fitSampleMod: Int = 1): DataFrame = {
    // the SAME quantizer dispatch every IVF entry point uses — the
    // report must measure the quantizer ivfTopK actually runs with
    val (centroids, _) = quantize(corpus, nLists, kmeansIters, fitSampleMod)
    val assigned = ivfAssignWithSim(corpus, centroids)
    val perList = assigned
      .select(col("centroid_id"),
        floor(col("centroid_sim") * lit(1000000.0d) + lit(0.5d)).cast("long")
          .as("sim_micro"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("sim_micro")).as("sum_sim_micro"),
        min(col("sim_micro")).as("min_sim_micro"))
    val total = perList.agg(sum(col("n_vectors")).as("__total"))
    perList.crossJoin(broadcast(total))
      .select(col("centroid_id"), col("n_vectors"),
        expr("n_vectors * 1000000 div __total").as("share_ppm"),
        // the SUM, not the mean: sum_sim_micro can be negative (cosine
        // spans [-1,1]) and truncating-vs-floor integer division would
        // diverge across engines there — the reader divides by n_vectors
        col("sum_sim_micro"), col("min_sim_micro"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 2, balanceFactor: Double = 4.0,
              fitSampleMod: Int = 1): DataFrame = {
    val (centroids, lists) = quantize(corpus, nLists, kmeansIters, fitSampleMod)
    // probe assignment: nProbe nearest centroids per query — same
    // broadcast-array shape as the assign step: sort struct{-sim, id}
    // ascending (= sim desc, id asc), take nProbe, explode. No window,
    // no shuffle of the query side.
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2Norm("embedding").as("qnorm"))
    val probes = q.crossJoin(broadcast(centroidArray(centroids)))
      .withColumn("pr", explode(slice(array_sort(transform(col("cents"), c =>
        struct(
          (-(graft.functions.VecFunctions.vec_dot(col("qe"), c.getField("centroid")) /
            (col("qnorm") * c.getField("cnorm")))).as("negsim"),
          c.getField("centroid_id").as("centroid_id")))), 1, nProbe)))
      .select(col("query_id"), col("qe"), col("qnorm"),
        col("pr.centroid_id").as("centroid_id"))
    // search only the probed inverted lists. NOT force-broadcast: the
    // probe side is queries × nProbe rows each carrying a full embedding
    // — tiny for ANN serving (few queries), but a forced broadcast would
    // OOM the driver when queries ≈ corpus (all-pairs usage). AQE picks
    // broadcast automatically whenever the probe side is actually small.
    val scored = joinProbedLists(lists, probes, nLists, balanceFactor)
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot("qe", "embedding") / (col("qnorm") * l2Norm("embedding"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Near-dup pairs via multi-table SRP-LSH + exact cosine re-check on
    * candidates only. A single nPlanes-bit table recalls a cos-θ pair
    * with probability (1 − θ/π)^nPlanes — far too low alone — so the
    * standard construction unions candidates from nTables independent
    * tables (seeds 42, 43, …): recall 1 − (1 − p)^L while every
    * candidate is still found by an equi-join on (table, bucket), never
    * an all-pairs scan. Exact cosine on the deduped candidate set keeps
    * precision at 1.
    *
    * Scale rule — nPlanes must FOLLOW the corpus: each table has
    * 2^nPlanes buckets, so expected occupancy is n/2^nPlanes and the
    * bucket self-join emits Θ(n²/2^nPlanes) candidates. A fixed plane
    * count is therefore quadratic once buckets saturate (measured: the
    * sf6.4 probe, SCALING.md "5th-decade"). Hold occupancy constant by
    * setting nPlanes = [[lshPlanesFor]](n) — candidates then grow
    * Θ(n·occupancy), linear in data — and compensate the lower
    * per-table recall with more tables (recall 1 − (1 − p)^L). The
    * gates pin nPlanes=8 for cross-engine oracle parity at fixture
    * sizes; a deployment derives it from the corpus count.
    */
  /** The plane count that holds expected bucket occupancy at
    * `targetBucket` for an `n`-vector corpus: ceil(log2(n /
    * targetBucket)), floored at 8 (the fixture/gate setting). With
    * occupancy pinned, the LSH candidate join is linear in n — the
    * knob a 100 TB deployment turns as the corpus grows.
    */
  def lshPlanesFor(n: Long, targetBucket: Int = 64): Int = {
    require(n > 0 && targetBucket > 0, "lshPlanesFor: n and targetBucket must be positive")
    val needed = math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt
    math.max(8, needed)
  }

  def lshCosinePairs(emb: DataFrame, dim: Int, threshold: Double,
                     nPlanes: Int = 8, nTables: Int = 6): DataFrame = {
    val keys = array((0 until nTables).map(t =>
      lshBucketKey("embedding", dim, nPlanes, seed = 42L + t)): _*)
    // The vectors ride IN the keyed frame, so the only data-sized
    // shuffle is nTables·n skinny-plus-one-array rows on (tbl, bucket);
    // the cosine is computed inside the bucket self-join while both
    // vectors are co-located and below-threshold candidates die BEFORE
    // the pair-dedup shuffle. The alternative (distinct the candidate
    // ids, then re-join the vectors twice) shuffles Θ(candidates) rows
    // carrying the arrays — measured 2.2× more wall per candidate at
    // the 5th-decade probe (SCALING.md), and candidates dominate n
    // past bucket saturation. A pair colliding in several tables costs
    // one redundant map-side dot per extra table (bounded by nTables),
    // traded for never shuffling a fat row; the post-filter distinct
    // sees only survivors. Same fold, same output, same hash.
    val keyed = emb.select(col("vec_id"), col("embedding"),
      l2Norm("embedding").as("norm"),
      posexplode(keys).as(Seq("tbl", "bucket")))
    keyed.as("a").join(keyed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (graft.functions.VecFunctions.vec_dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** Per-table LSH occupancy census — the pre-flight audit for
    * [[lshCosinePairs]], read BEFORE a run the way [[ivfBalance]] is
    * for IVF. `candidate_pairs` = Σ_buckets c·(c−1)/2 is EXACTLY the
    * within-bucket join output that table will emit (pre-distinct), so
    * it prices the candidate join without running it: when it grows
    * faster than the corpus, buckets have saturated and nPlanes must
    * rise ([[lshPlanesFor]] — see the scale rule on lshCosinePairs).
    * All-integer aggregates (count/max/sum over longs) — engine-exact.
    * One shuffle on (tbl, bucket), second agg is nTables-row tiny.
    */
  def lshBucketStats(emb: DataFrame, dim: Int,
                     nPlanes: Int = 8, nTables: Int = 6): DataFrame = {
    val keys = array((0 until nTables).map(t =>
      lshBucketKey("embedding", dim, nPlanes, seed = 42L + t)): _*)
    emb.select(posexplode(keys).as(Seq("tbl", "bucket")))
      .groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("occupancy"))
      .groupBy(col("tbl")).agg(
        count(lit(1)).as("n_buckets"),
        max(col("occupancy")).as("max_occupancy"),
        sum(col("occupancy")).as("n_vectors"),
        // c·(c−1) is always even, so the integral `div` is exact
        expr("sum(occupancy * (occupancy - 1)) div 2").as("candidate_pairs"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× storage/bandwidth compression a vector store applies before
    * indexing 100 TB of embeddings. Per-vector absmax scaling:
    * `q[i] = floor(v[i] * 127 / absmax + 0.5)` computed entirely in
    * double precision (float→double casts are exact, IEEE division and
    * floor are engine-independent), so the result is bit-reproducible on
    * any engine. Zero vectors quantize to zeros with scale 0. Narrow
    * per-row transform — shuffle-free, codegen'd.
    *
    * Output: `scale` (double, absmax/127 — dequantize multiplier) and
    * `q_csv` (the int8 codes joined with ',' for a representation-stable
    * cross-engine hash).
    */
  /** The ONE definition of the SQ8 quantization arithmetic — shared by
    * [[quantizeInt8]] (csv codes) and [[sqTopK]] (integer-array codes)
    * so their codes can never drift apart (both oracle twins mirror
    * this exact text). */
  private val int8AbsMax: Column = expr(
    "aggregate(embedding, CAST(0 AS DOUBLE), (m, v) -> greatest(m, abs(CAST(v AS DOUBLE))))")
  private def int8Round(v: Column, absmax: Column): Column =
    floor(v.cast("double") * 127.0d / absmax + 0.5d)

  def quantizeInt8(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"), int8AbsMax.as("absmax"))
      .select(
        col("vec_id"),
        (col("absmax") / 127.0d).as("scale"),
        when(col("absmax") === 0d,
          array_join(transform(col("embedding"), _ => lit("0")), ","))
          .otherwise(array_join(
            transform(col("embedding"), v =>
              int8Round(v, col("absmax")).cast("int").cast("string")),
            ",")).as("q_csv"))

  /** Matryoshka truncation eval (Kusupati et al. 2022): recall@k of
    * PREFIX-dimension cosine search against the full-dimension truth —
    * the number that says whether serving the cheap `prefixDim`-wide
    * index (a `dim/prefixDim`× scan reduction at 100 TB) is safe for
    * this embedding space, measured instead of assumed. Both arms are
    * the [[cosineTopK]] plan (broadcast query side, WindowGroupLimit
    * top-k); the overlap is a k-row-per-query semi-join.
    */
  def matryoshkaRecall(queries: DataFrame, corpus: DataFrame, k: Int,
                       prefixDim: Int): DataFrame = {
    require(k >= 1 && prefixDim >= 1,
      s"matryoshkaRecall: bad k=$k prefixDim=$prefixDim")
    def pre(df: DataFrame): DataFrame = df.select(col("vec_id"),
      slice(col("embedding"), 1, prefixDim).as("embedding"))
    // Truncation can produce all-zero prefixes even when the full
    // vectors are norm-checked — pin the undefined 0/0 cosine to −2.0
    // (below any real cosine) on both arms so ranking is engine-stable.
    val truth = cosineTopK(queries, corpus, k, zeroNormSentinel = Some(-2.0d))
      .select(col("query_id"), col("neighbor_id"))
    val approx = cosineTopK(pre(queries), pre(corpus), k, zeroNormSentinel = Some(-2.0d))
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    queries.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(coalesce(n_hits, 0L) * 1000000) div $k").as("recall_ppm"))
  }

  /** Scalar-quantized (SQ8) brute-force top-k — the Faiss
    * `SQ8`-flat serving shape: both sides quantize to int8 codes with a
    * per-vector absmax scale (the [[quantizeInt8]] arithmetic, kept as
    * integer arrays here), the inner product runs as an EXACT i64 dot
    * over the codes (the 4×-narrower scan that makes SQ the default
    * 100 TB compromise before PQ), and only the final score multiplies
    * the two scales back in — one fixed-order double product per pair,
    * so ranking hash-verifies cross-engine. Zero-vector edges quantize
    * to zero codes with scale 0 (score 0, never a division). Query side
    * broadcasts; the only shuffle is the per-query top-k, and the
    * `row_number ≤ k` filter compiles to WindowGroupLimit (top-k before
    * the exchange).
    */
  def sqTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"sqTopK: k must be positive, got $k")
    def quant(side: DataFrame, id: String, sc: String, qc: String): DataFrame =
      side
        .select(col("vec_id").as(id), int8AbsMax.as("__am"), col("embedding"))
        .select(col(id), (col("__am") / 127.0d).as(sc),
          when(col("__am") === 0d,
            transform(col("embedding"), _ => lit(0L)))
            .otherwise(transform(col("embedding"), v =>
              int8Round(v, col("__am")).cast("long")))
            .as(qc))
    val q = quant(queries, "query_id", "qscale", "qq")
    val c = quant(corpus, "neighbor_id", "cscale", "cq")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qq, cq, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
          .as("idot"),
        col("qscale"), col("cscale"))
      .withColumn("score", expr("(qscale * cscale) * CAST(idot AS DOUBLE)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        col("idot"), col("score"))
  }

  /** Product-quantization encode: split each vector into `m` subvectors,
    * assign each to its nearest codebook entry (squared-L2 argmin via
    * `argmax(2·a·c − ‖c‖²)` — ‖a‖² is constant per subvector and drops
    * out), emitting one `(vec_id, subspace, code)` row per subvector —
    * the 8×-compressed representation IVF-PQ search builds on.
    * Codebooks are the sliced lowest-`k` vectors (the same deterministic
    * stand-in for an offline k-means fit as [[ivfAssign]], documented).
    *
    * Scale shape: the corpus side is a narrow explode (×m rows, no
    * shuffle) broadcast-joined to the per-subspace candidate arrays,
    * then a per-row fold — zero corpus shuffle end-to-end, same
    * plan posture as [[ivfAssignWith]]. Ties break toward the lowest
    * code id, and every double is the sequential-fold parity form.
    */
  /** Subvector slices of an embedding column: m windows of dim/m. */
  private def pqSlices(e: Column, m: Int, dim: Int): Column =
    array((0 until m).map(i => slice(e, i * (dim / m) + 1, dim / m)): _*)

  /** The sliced-codebook SEED rows `(cid, sm, csub)`: subvector slices
    * of the lowest-k vectors — both the iteration-0 codebook of the
    * fitted path and the `pqIters = 0` SQL-trivial baseline. */
  private def pqCodebookSeed(corpus: DataFrame, m: Int, k: Int, dim: Int): DataFrame =
    corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding"))
      .select(col("cid"), posexplode(pqSlices(col("embedding"), m, dim)).as(Seq("sm", "csub")))

  /** FITTED per-subspace PQ codebook: independent exact-mean Lloyd
    * rounds in every subspace — the proper PQ training loop (Jégou et
    * al. 2011 run k-means per subquantizer), replacing the sliced-seed
    * stand-in as the default. All m fits ride ONE DataFrame job per
    * round: assignment is the same broadcast per-subspace argmax as
    * [[pqEncodeWith]] (zero corpus shuffle), the update aggregates
    * m×k×(dim/m) tiny fixed-point rows. Means use the identical
    * integer-micro discipline as [[kmeansCentroids]], so the fitted
    * codebook is bit-reproducible on any engine/partitioning and every
    * PQ query keeps its DuckDB hash oracle. Empty codes keep their
    * previous entry (standard fallback).
    */
  def pqCodebookFitted(corpus: DataFrame, m: Int, k: Int, dim: Int,
      iters: Int = 2): DataFrame = {
    var cb = pqCodebookSeed(corpus, m, k, dim)
    val sub = corpus.select(col("vec_id"),
      posexplode(pqSlices(col("embedding"), m, dim)).as(Seq("sm", "subvec")))
    for (_ <- 1 to iters) {
      // not checkpointed: cands is an m-row groupBy over the (pinned)
      // 128-row codebook — recomputing it inside the broadcast subtree
      // is trivial, where the old eager pin paid a full driver job per
      // round (these fits are job-count-bound, not data-bound)
      val cands = cb.groupBy(col("sm"))
        .agg(array_sort(collect_list(struct(col("cid"), col("csub")))).as("cands"))
      val assigned = sub.join(broadcast(cands), "sm")
        .withColumn("best", array_max(transform(col("cands"), c =>
          struct(
            (graft.functions.VecFunctions.vec_dot(col("subvec"), c.getField("csub")) * 2.0d
              - graft.functions.VecFunctions.vec_norm2(c.getField("csub"))).as("score"),
            (-c.getField("cid")).as("negid")))))
        .select(col("sm"), (-col("best.negid")).as("cid"), col("subvec"))
      val means = assigned
        .select(col("sm"), col("cid"), posexplode(col("subvec")).as(Seq("pos", "v")))
        .groupBy(col("sm"), col("cid"), col("pos"))
        .agg(
          sum(floor(col("v").cast("double") * 1000000.0d + 0.5d).cast("long")).as("ms"),
          count(lit(1)).as("n"))
        .groupBy(col("sm"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
            (col("ms").cast("double") / (col("n").cast("double") * 1000000.0d))
              .cast("float").as("mn")))),
          s => s.getField("mn")).as("mean"))
      cb = cb.join(means, Seq("sm", "cid"), "left")
        .select(col("cid"), col("sm"), coalesce(col("mean"), col("csub")).as("csub"))
        .localCheckpoint(true)
    }
    cb
  }

  /** The ONE quantizer definition shared by encode and search (drift
    * here would silently wrong every ADC ranking): fitted per-subspace
    * kmeans by default, sliced seed at `iters <= 0`. */
  private def pqCodebook(corpus: DataFrame, m: Int, k: Int, dim: Int,
      iters: Int): DataFrame =
    if (iters <= 0) pqCodebookSeed(corpus, m, k, dim)
    else pqCodebookFitted(corpus, m, k, dim, iters)

  def pqCodes(emb: DataFrame, m: Int = 8, k: Int = 16, dim: Int = 64,
      pqIters: Int = 2): DataFrame =
    pqEncodeWith(emb, emb, m, k, dim, pqIters)

  /** PQ-encode `vectors` against a codebook built from a separate
    * static `codebookSource` — the continuous-ingest form: the encode
    * side may be a STREAMING DataFrame (the codebook side cannot be,
    * it orders and limits), and the join/fold body is identical to the
    * batch path. */
  def pqEncodeWith(vectors: DataFrame, codebookSource: DataFrame,
      m: Int = 8, k: Int = 16, dim: Int = 64, pqIters: Int = 2): DataFrame =
    pqEncodeWithCb(vectors, pqCodebook(codebookSource, m, k, dim, pqIters), m, dim)

  /** Encode against an already-built `(cid, sm, csub)` codebook — the
    * shared body, so IVF-PQ can fit ONE codebook and feed both the
    * encode and the distance-table sides. */
  def pqEncodeWithCb(vectors: DataFrame, codebook: DataFrame,
      m: Int = 8, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    // localCheckpoint materializes the m-row codebook ONCE — without it
    // a streaming join re-scans the whole static corpus to rebuild the
    // identical broadcast side on every trigger
    val cb = codebook
      .groupBy(col("sm"))
      .agg(array_sort(collect_list(struct(col("cid"), col("csub")))).as("cands"))
      .localCheckpoint(true)
    vectors
      .select(col("vec_id"), posexplode(pqSlices(col("embedding"), m, dim)).as(Seq("sm", "subvec")))
      .join(broadcast(cb), "sm")
      .withColumn("best", array_max(transform(col("cands"), c =>
        struct(
          (graft.functions.VecFunctions.vec_dot(col("subvec"), c.getField("csub")) * 2.0d
            - graft.functions.VecFunctions.vec_norm2(c.getField("csub"))).as("score"),
          (-c.getField("cid")).as("negid")))))
      .select(col("vec_id"), col("sm").cast("long").as("subspace"),
        (-col("best.negid")).cast("long").as("code"))
  }

  /** PQ asymmetric-distance search (ADC): per query, a tiny m×k
    * distance table (query subvector vs every codebook entry), then
    * each corpus vector scores as the sum of table entries its codes
    * select — the vector itself is never touched, only its m codes.
    * Score per subspace is `2·q·c − ‖c‖²` (‖q‖² drops out of ranking),
    * summed in subspace order via a sequential fold (engine-exact, not
    * an association-order-defined SUM).
    *
    * Scale shape: the distance table is queries×m×k rows — broadcast;
    * the codes side (from [[pqCodes]], zero corpus shuffle) joins it
    * map-side; the only exchange is the (query, vector) score
    * aggregation and the per-query top-k, both partial-agg'd. This is
    * the standard IVF-PQ memory story: search touches 8 bytes per
    * vector, not 256.
    */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, kCodes: Int = 16, dim: Int = 64, pqIters: Int = 2): DataFrame = {
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    // ONE fitted codebook feeds both the distance table and the encode —
    // fitting twice would be wasted Lloyd rounds (results identical:
    // the fit is deterministic, but the work is not free)
    val cbDf = pqCodebook(corpus, m, kCodes, dim, pqIters)
    val cbSub = cbDf.withColumnRenamed("sm", "dsm")
    val qSub = queries.select(col("vec_id").as("query_id"),
      posexplode(pqSlices(col("embedding"), m, dim)).as(Seq("qsm", "qsub")))
    val dtable = qSub.join(cbSub, col("qsm") === col("dsm"))
      .select(col("query_id"), col("dsm"), col("cid"),
        (graft.functions.VecFunctions.vec_dot(col("qsub"), col("csub")) * 2.0d
          - graft.functions.VecFunctions.vec_norm2(col("csub"))).as("score"))
    val codes = pqEncodeWithCb(corpus, cbDf, m, dim)
    // no broadcast hint: for ANN serving the table is tiny and AQE
    // broadcasts it; when queries ≈ corpus a forced broadcast would OOM
    // the driver (same stance as ivfTopK)
    val scored = codes
      .join(dtable,
        col("subspace") === col("dsm") && col("code") === col("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("subspace"), col("score")))),
        lit(0.0d), (acc, s) => acc + s.getField("score")).as("adc_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_score"))
  }

  /** IVF-PQ search — the composition the big-vector-search systems run
    * as their default (coarse quantizer routes, product quantizer
    * scores): a query probes its `nProbe` nearest inverted lists, and
    * candidates inside those lists are ranked by the PQ asymmetric
    * distance over their 8-byte codes — the full vector is touched by
    * NEITHER stage. Cost per query ≈ (nProbe/nLists) · corpus · m code
    * lookups against a broadcast m×k distance table.
    *
    * Both stages are the proven components ([[ivfAssign]] broadcast
    * argmax routing, [[pqCodes]]/ADC fold scoring) — same deterministic
    * integer/sequential-fold discipline, so the composed ranking is
    * oracle-verifiable end-to-end.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, kCodes: Int = 16, dim: Int = 64,
                kmeansIters: Int = 2, pqIters: Int = 2,
                balanceFactor: Double = 4.0): DataFrame = {
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    // the IVF Lloyd rounds and the PQ codebook rounds are INDEPENDENT
    // fit loops over the same corpus, each a chain of eager checkpoint
    // jobs — run them as concurrent driver-thread job groups (§2.6) so
    // the two chains' driver latencies and task tails overlap instead
    // of adding up; results and every consumer are unchanged
    val ((centroids, lists), cbDf) = DriverJobs.par2(
      quantize(corpus, nLists, kmeansIters),
      pqCodebook(corpus, m, kCodes, dim, pqIters))
    // codes carry their list id via a narrow vec_id join (both sides
    // derive from the same corpus scan; no embeddings move)
    val codes = pqEncodeWithCb(corpus, cbDf, m, dim)
      .join(lists.select(col("vec_id"), col("centroid_id")), "vec_id")
    ivfPqSearchWith(queries, centroids, cbDf, codes, k, nLists, nProbe, m, dim,
      balanceFactor)
  }

  /** The SEARCH half of [[ivfPqTopK]], taking prebuilt index frames —
    * what actually runs in serving, where the index is fit once
    * ([[saveIvfPqIndex]]) and queried many times: probe routing against
    * the broadcast centroids, the per-query ADC distance table from the
    * persisted codebook, scoring over probed lists' CODES only. No
    * Lloyd round, no encode pass, no corpus embedding ever loads.
    */
  def ivfPqSearchWith(queries: DataFrame, centroids: DataFrame, cbDf: DataFrame,
                      codes: DataFrame, k: Int, nLists: Int = 16,
                      nProbe: Int = 4, m: Int = 8, dim: Int = 64,
                      balanceFactor: Double = 4.0): DataFrame = {
    // routing: nProbe nearest lists per query — the ivfTopK probe shape
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      l2Norm("embedding").as("qnorm"))
    val probes = q.crossJoin(broadcast(centroidArray(centroids)))
      .withColumn("pr", explode(slice(array_sort(transform(col("cents"), c =>
        struct(
          (-(graft.functions.VecFunctions.vec_dot(col("qe"), c.getField("centroid")) /
            (col("qnorm") * c.getField("cnorm")))).as("negsim"),
          c.getField("centroid_id").as("centroid_id")))), 1, nProbe)))
      .select(col("query_id").as("p_query"), col("pr.centroid_id").as("centroid_id"))
    // scoring: the pqAdcTopK distance table, broadcast — built from the
    // SAME fitted codebook as the codes (cbDf)
    val dtable = queries
      .select(col("vec_id").as("d_query"),
        posexplode(pqSlices(col("embedding"), m, dim)).as(Seq("sm", "qsub")))
      .join(cbDf, "sm")
      .select(col("d_query"), col("sm"), col("cid"),
        (graft.functions.VecFunctions.vec_dot(col("qsub"), col("csub")) * 2.0d
          - graft.functions.VecFunctions.vec_norm2(col("csub"))).as("score"))
    val scored = joinProbedLists(codes, probes, nLists, balanceFactor)
      .join(broadcast(dtable),
        col("subspace") === col("sm") && col("code") === col("cid") &&
          col("p_query") === col("d_query"))
      .filter(col("p_query") =!= col("vec_id"))
      .groupBy(col("p_query").as("query_id"), col("vec_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("subspace"), col("score")))),
        lit(0.0d), (acc, s) => acc + s.getField("score")).as("adc_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_score"))
  }

  /** Persist the IVF-PQ serving index: coarse centroids, PQ codebook,
    * list-tagged codes — three parquet tables plus a manifest recording
    * the fit parameters (a search with mismatched m/dim against these
    * artifacts would silently score garbage; the manifest makes the
    * loader fail loudly instead). The big table (`codes`) is ~9 bytes a
    * vector; centroids and codebook are KB-scale. Fit-once-query-many
    * is the 100 TB serving shape — rebuilding the quantizer per query
    * batch (what a naive [[ivfPqTopK]] loop would do) pays Lloyd and a
    * full corpus encode every time.
    */
  def saveIvfPqIndex(corpus: DataFrame, dir: String, nLists: Int = 16,
                     m: Int = 8, kCodes: Int = 16, dim: Int = 64,
                     kmeansIters: Int = 2, pqIters: Int = 2): Unit = {
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    // same concurrent fit groups as [[ivfPqTopK]] (§2.6)
    val ((centroids, lists), cbDf) = DriverJobs.par2(
      quantize(corpus, nLists, kmeansIters),
      pqCodebook(corpus, m, kCodes, dim, pqIters))
    val codes = pqEncodeWithCb(corpus, cbDf, m, dim)
      .join(lists.select(col("vec_id"), col("centroid_id")), "vec_id")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    cbDf.write.mode("overwrite").parquet(s"$dir/codebook")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val manifest =
      s"""{"nLists":$nLists,"m":$m,"kCodes":$kCodes,"dim":$dim,
         |"kmeansIters":$kmeansIters,"pqIters":$pqIters}""".stripMargin
    val path = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
    val fs = path.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Search a persisted [[saveIvfPqIndex]] index. `m`/`dim`/`nLists`
    * come from the manifest — a caller can't mis-pair them with the
    * artifacts. Only the probed lists' codes are read (plus the two
    * KB-scale tables); corpus embeddings never load.
    */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       queries: DataFrame, k: Int, nProbe: Int = 4,
                       balanceFactor: Double = 4.0): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val manifest = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def param(key: String): Int = {
      val m0 = s""""$key":(\\d+)""".r.findFirstMatchIn(manifest)
      require(m0.isDefined, s"ivf-pq manifest at $dir lacks '$key': $manifest")
      m0.get.group(1).toInt
    }
    ivfPqSearchWith(queries,
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebook"),
      spark.read.parquet(s"$dir/codes"),
      k, param("nLists"), nProbe, param("m"), param("dim"), balanceFactor)
  }

  /** Per-dimension corpus statistics in exact integer micros — the
    * input every normalization / whitening / clipping pass needs
    * (mean = sum/n downstream, range for min-max scaling, outlier dims
    * by |max|). One (pos)-keyed partial agg; dim rows out.
    */
  def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("pos"),
        expr("cast(floor(cast(v as double) * 1000000 + 0.5) as bigint)").as("vm"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_micros"),
        min(col("vm")).as("min_micros"), max(col("vm")).as("max_micros"))

  /** Embedding-distribution drift between two corpus slices (old vs new
    * crawl, train vs serve) — the model-input monitoring report: per
    * dimension, the exact integer mean shift and range change from
    * [[dimStats]] accumulators. A dimension whose mean moved by a large
    * fraction of its historical range means the upstream featurizer (or
    * the corpus itself) changed — caught here, BEFORE a quantizer/index
    * fitted on the old distribution silently degrades. drift_ppm scales
    * |Δmean| by slice-a's range (0 when the range is 0). Two dim-keyed
    * partial aggs + a dim-sized join: report cost is O(dim).
    */
  def dimDrift(a: DataFrame, b: DataFrame): DataFrame = {
    // `div` truncates toward zero; sum_micros IS negative for real dims,
    // so the sign convention matters. Verified (r8): DuckDB's `//` on
    // INTEGER operands ALSO truncates toward zero ((-7)//2 = -3; it
    // floors only for floats), so the two engines agree exactly here.
    def side(df: DataFrame, tag: String) = dimStats(df)
      .select(col("pos"),
        expr("sum_micros div n").as(s"mean_${tag}_micro"),
        col("min_micros").as(s"min_$tag"), col("max_micros").as(s"max_$tag"))
    side(a, "a").join(side(b, "b"), "pos")
      .withColumn("mean_shift_micro", abs(col("mean_b_micro") - col("mean_a_micro")))
      .withColumn("drift_ppm",
        when(col("max_a") === col("min_a"), lit(0L))
          .otherwise(expr("mean_shift_micro * 1000000 div (max_a - min_a)")))
      .select(col("pos"), col("mean_a_micro"), col("mean_b_micro"),
        col("mean_shift_micro"), col("drift_ppm"),
        (col("min_b") < col("min_a") || col("max_b") > col("max_a")).as("range_expanded"))
  }

  /** Two-stage search — the production ANN pattern: the compressed
    * index (IVF-PQ) proposes `kCand` candidates from 8-byte codes, an
    * EXACT cosine re-scoring of only those candidates picks the final
    * `k`. Recall comes from the cheap wide stage, precision from the
    * narrow exact stage; full vectors are touched only for
    * `kCand × |queries|` rows, never the corpus.
    */
  def ivfPqRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                  kCand: Int = 30, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val cands = ivfPqTopK(queries, corpus, kCand, nLists, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), l2Norm("embedding").as("cnorm"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), l2Norm("embedding").as("qnorm"))
    val rescored = cands.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("cosine",
        graft.functions.VecFunctions.vec_dot(col("ce"), col("qe")) /
          (col("cnorm") * col("qnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Dense Johnson–Lindenstrauss random projection: `p_j = dot(v,
    * plane_j)` for `outDim` deterministic pseudo-random planes (same
    * xorshift generator as the LSH family — one generator, two engines,
    * so the oracle embeds identical plane literals). The 100 TB shape:
    * planes are plan-time constants, the projection is a narrow per-row
    * codegen'd map with zero shuffle; downstream coarse clustering /
    * ANN then works in `outDim` dimensions instead of `dim`.
    */
  def randomProject(emb: DataFrame, dim: Int = 64, outDim: Int = 8,
      seed: Long = 7L): DataFrame = {
    val planes = lshPlanes(dim, outDim, seed)
    emb.select(col("vec_id") +: (0 until outDim).map { j =>
      graft.functions.VecFunctions.vec_dot(col("embedding"), typedLit(planes(j)))
        .as(s"p$j")
    }: _*)
  }

  /** Per-label centroid of an embedding column, as exact integer
    * micro-sums: component micros = `floor(c*1e6 + 0.5)` (pure IEEE ops,
    * representation-stable across engines), summed as BIGINT per
    * (label, pos) with a count — `mean_j = comp_micros_sum / (n*1e6)`
    * downstream. Float means are NOT cross-engine stable (association
    * order); integer sums are, which is why the contract is sums+count.
    * One partial-aggregated shuffle on (label, pos) — map-side combine
    * keeps the exchange at |labels|×dim rows at any corpus size.
    */
  def centroidSumsByLabel(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "comp")))
      .groupBy(col("label"), col("pos"))
      .agg(
        sum(floor(col("comp").cast("double") * 1000000.0d + 0.5d).cast("long"))
          .as("comp_micros_sum"),
        count(lit(1)).as("n"))

  /** Top principal direction of the embedding cloud by POWER ITERATION
    * in integer fixed point — the dominant eigenvector of XᵀX, the
    * 1-component PCA every embedding-drift / whitening pass starts
    * from. Vectors quantize to milli-units once; each iteration is two
    * sparse matvecs (`s = X v`, `w = Xᵀ s`) as plain equi-join +
    * partial-agg sums, then an integer renormalization to ±1000 via the
    * max-|component| (sign-safe truncating division — Spark `div` and a
    * positive-only `//` agree; raw `//` on negatives would floor where
    * `div` truncates). Every step is an order-independent integer sum,
    * so the unrolled SQL oracle hash-matches.
    *
    * Scale shape: the direction vector (dim rows) broadcasts; the
    * corpus never shuffles except the two partial aggs. Overflow
    * headroom: |s| ≤ dim·maxq·1000, |w| ≤ n·|s|·maxq — past ~10⁸ rows
    * rescale `s` (divide by a power of two) before the second matvec;
    * documented, not needed at bench scale.
    */
  def powerIterationTop(emb: DataFrame, iters: Int, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    val x = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"),
        floor(col("xf").cast("double") * 1000.0d + 0.5d).cast("long").as("xq"))
    var v = spark.range(dim)
      .select(col("id").cast("int").as("pos"), lit(1000L).as("v"))
    for (_ <- 1 to iters) {
      val s = x.join(broadcast(v), "pos")
        .groupBy(col("vec_id")).agg(sum(col("xq") * col("v")).as("s"))
      val w = x.join(s, "vec_id")
        .groupBy(col("pos")).agg(sum(col("s") * col("xq")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("pos"), expr(
          "CASE WHEN m = 0 THEN CAST(0 AS BIGINT) " +
            "WHEN w < 0 THEN -((abs(w) * 1000) div m) " +
            "ELSE (abs(w) * 1000) div m END").as("v"))
        .localCheckpoint(eager = false)
    }
    v
  }
}
