package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Invariant tests for the non-SQL-expressible dedup/similarity ops
  * (MinHash-LSH, SimHash, sign-projection LSH). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf001).cache()

  test("identical docs get identical minhash signatures") {
    val doubled = docs.limit(5)
      .unionByName(docs.limit(5).withColumn("doc_id", col("doc_id") + 10000))
    val sigs = Dedup.minhashSignatures(doubled)
    val cols = sigs.columns.filter(_.startsWith("mh_"))
    val byContent = sigs.withColumn("orig", pmod(col("doc_id"), lit(10000)))
      .groupBy("orig")
      .agg(countDistinct(concat_ws(",", cols.map(col): _*)).as("variants"))
    assert(byContent.filter(col("variants") =!= 1).count() === 0,
      "same content must hash to the same signature")
  }

  test("minhash-LSH finds planted exact duplicates") {
    val doubled = docs.limit(20)
      .unionByName(docs.limit(20).withColumn("doc_id", col("doc_id") + 10000))
    val pairs = Dedup.minhashLshPairs(doubled).collect()
    val planted = (0 until 20).map(i => (i.toLong, i + 10000L)).toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(found), s"LSH must recover all identical pairs; missing ${planted -- found}")
  }

  test("minhashJaccardEst: exact duplicates estimate 1.0 exactly, all estimates bounded") {
    val doubled = docs.limit(10)
      .unionByName(docs.limit(10).withColumn("doc_id", col("doc_id") + 10000))
    val est = Dedup.minhashJaccardEst(doubled).collect()
    val dup = est.filter(r => r.getLong(1) === r.getLong(0) + 10000)
    assert(dup.length === 10, "every planted duplicate pair must be a candidate")
    dup.foreach { r =>
      assert(r.getAs[Long]("sig_matches") === 16L)
      assert(r.getAs[Long]("est_ppm") === 1000000L)
      assert(r.getAs[Long]("jaccard_ppm") === 1000000L,
        "identical shingle sets must measure J = 1 exactly")
    }
    est.foreach { r =>
      val e = r.getAs[Long]("est_ppm"); val j = r.getAs[Long]("jaccard_ppm")
      assert(e >= 0L && e <= 1000000L)
      assert(j >= 0L && j <= 1000000L)
      assert(r.getAs[Long]("n_a") > 0L && r.getAs[Long]("n_b") > 0L)
    }
  }

  test("minhash-LSH candidates correlate with true Jaccard (recall on near-dups)") {
    val truth = Dedup.jaccardPairs(docs, n = 3, threshold10 = 8) // J >= 0.8
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (truth.nonEmpty) {
      val recall = truth.count(lsh.contains).toDouble / truth.size
      assert(recall >= 0.8, s"recall $recall too low: ${truth.size} true pairs, ${lsh.size} candidates")
    }
  }

  test("minhash-LSH hot bucket degrades to star edges, not m^2 pairs") {
    // 1,000 identical docs: every band key collides into ONE bucket.
    // Without the guard that is 499,500 pairs from a single join task;
    // with it, m-1 star edges per band → exactly 999 distinct pairs,
    // all anchored at the bucket-min doc_id, and connected components
    // are unchanged (everything reachable through the anchor).
    val m = 1000
    val hot = (0 until m).map(i => (i.toLong, "src0", "the same boilerplate text repeated across the mirror set"))
      .toDF("doc_id", "source", "text")
    val pairs = Dedup.minhashLshPairs(hot).collect()
    assert(pairs.length === m - 1, s"expected ${m - 1} star edges, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 0L), "every edge must anchor at the bucket-min doc")
    assert(pairs.map(_.getLong(1)).toSet === (1 until m).map(_.toLong).toSet,
      "every member must stay connected to the anchor")
    // cap disabled reproduces the full pair set (legacy shape)
    val unbounded = Dedup.minhashLshPairs(hot.limit(60), maxBucket = Dedup.Unbounded)
    assert(unbounded.count() === 60L * 59 / 2)
  }

  test("simhash of identical docs is identical; hamming 0") {
    val doubled = docs.limit(5)
      .unionByName(docs.limit(5).withColumn("doc_id", col("doc_id") + 10000))
    val pairs = Dedup.simhashPairs(doubled, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(i => (i.toLong, i + 10000L)).toSet
    assert(planted.subsetOf(pairs))
  }

  test("LSH cosine pairs is a subset-with-high-recall of brute force") {
    val emb = Tables.embeddings(spark, sf001)
    val brute = Dedup.embeddingNearDups(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(emb, dim = 64, threshold = 0.45, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair must satisfy the exact threshold (re-check step)
    assert(lsh.subsetOf(brute), "LSH must re-verify candidates exactly")
    if (brute.nonEmpty) {
      val recall = brute.count(lsh.contains).toDouble / brute.size
      // 4 planes ⇒ P(same bucket) = (1 - θ/π)^4; for cosine .45 ≈ 0.33 rad-ish
      assert(recall > 0.2, s"recall $recall unexpectedly low (brute=${brute.size}, lsh=${lsh.size})")
    }
  }

  test("LSH occupancy census prices the candidate join exactly") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count()
    val stats = Similarity.lshBucketStats(emb, dim = 64).collect()
    assert(stats.length === 6, "one census row per hash table")
    // every vector hashes into exactly one bucket per table
    assert(stats.forall(_.getAs[Long]("n_vectors") == n))
    assert(stats.forall(r => r.getAs[Long]("n_buckets") >= 1 &&
      r.getAs[Long]("n_buckets") <= 256))
    // candidate_pairs must equal the independently recomputed
    // Σ_buckets c·(c−1)/2 — the exact pre-distinct join output
    val keys = org.apache.spark.sql.functions.array((0 until 6).map(t =>
      Similarity.lshBucketKey("embedding", 64, 8, seed = 42L + t)): _*)
    val recomputed = emb
      .select(org.apache.spark.sql.functions.posexplode(keys).as(Seq("tbl", "bucket")))
      .groupBy("tbl", "bucket").count()
      .collect().groupBy(_.getInt(0))
      .map { case (t, rs) => t -> rs.map(r => r.getLong(2) * (r.getLong(2) - 1) / 2).sum }
    stats.foreach { r =>
      assert(r.getAs[Long]("candidate_pairs") === recomputed(r.getInt(0)),
        s"table ${r.getInt(0)} census drifted from the recomputed pair sum")
    }
  }

  test("lshPlanesFor pins expected occupancy as the corpus grows") {
    // fixture floor: small corpora stay at the gate's 8 planes
    assert(Similarity.lshPlanesFor(1) === 8)
    assert(Similarity.lshPlanesFor(16000) === 8)
    // 128k vectors need 11 planes for occupancy ≤ 64
    assert(Similarity.lshPlanesFor(128000) === 11)
    // the invariant the scale rule promises: n / 2^planes ≤ target
    for (n <- Seq(1L, 1000L, 16000L, 128000L, 10000000L, 10000000000L)) {
      val p = Similarity.lshPlanesFor(n)
      assert(n.toDouble / math.pow(2, p) <= 64.0,
        s"occupancy not pinned at n=$n planes=$p")
    }
  }

  test("IVF top-k recall vs brute force is high at nProbe=4/16") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.cosineTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall (brute=${brute.size}, ivf=${ivf.size})")
    // every IVF hit must carry the exact cosine (re-check discipline)
    assert(ivf.subsetOf(
      Similarity.cosineTopK(queries, emb, emb.count().toInt).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("MMR: diversity term demotes the near-duplicate of an earlier pick") {
    import spark.implicits._
    // query q=[1,0]; a duplicates q's direction, b is a's near-dup,
    // c is orthogonal. Relevance-only top-2 = (a, b); MMR at λ=0.3
    // must pick a then c — b's similarity to the picked a outweighs
    // its relevance edge over c.
    val vecs = Seq(
      (100L, Array(1f, 0f)),          // the query
      (1L, Array(1f, 0f)),            // a: rel 1.0
      (2L, Array(0.99f, 0.141f)),     // b: rel ≈ 0.99, sim(b,a) ≈ 0.99
      (3L, Array(0f, 1f))             // c: rel 0, sim(c,a) 0
    ).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 100L)
    val got = graft.ops.Similarity.mmrSelect(q, vecs.filter(col("vec_id") < 100L),
        k = 3, lambdaMicro = 300000L, preselect = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got === Seq((1, 1L), (2, 3L), (3, 2L)),
      "greedy order must be a, c (diverse), then b (the near-dup)")
    // λ=1 degenerates to pure relevance order
    val rel = graft.ops.Similarity.mmrSelect(q, vecs.filter(col("vec_id") < 100L),
        k = 3, lambdaMicro = 1000000L, preselect = 3)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(rel === Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.mmrSelect(q, vecs, k = 5, preselect = 3)
    }
  }

  test("k-means quantizer: deterministic Lloyd rounds, empty clusters keep centroids, recall holds") {
    val emb = Tables.embeddings(spark, sf001)
    val c1 = Similarity.kmeansCentroids(emb, 16, iters = 2).orderBy("centroid_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val c2 = Similarity.kmeansCentroids(emb, 16, iters = 2).orderBy("centroid_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(c1.length === 16)
    assert(c1.toSeq === c2.toSeq, "deterministic across runs (no RNG at plan time)")
    // fitted quantizer must not lose recall vs the seed quantizer
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.cosineTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fitted = Similarity.ivfTopK(queries, emb, 5, nLists = 16, nProbe = 4, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(fitted.contains).toDouble / brute.size
    assert(recall >= 0.4, s"k-means IVF recall $recall")
  }

  test("IVF assign: broadcast-array argmax equals windowed argmax, zero shuffle Exchange") {
    val emb = Tables.embeddings(spark, sf001)
    val (centroids, lists) = Similarity.ivfAssign(emb, 16)
    // plan: the corpus is never shuffled — no shuffle Exchange of ANY
    // partitioning (hash/range/single); broadcast and reused exchanges
    // are expected and fine. ShuffleExchangeExec prints as 'Exchange …'.
    val plan = lists.queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.filter(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange") && !l.contains("ReusedExchange")).toSeq
    assert(shuffles.isEmpty,
      s"IVF assign must not shuffle the corpus, found: $shuffles\n$plan")
    // equivalence vs the straightforward windowed argmax formulation
    val windowed = {
      import org.apache.spark.sql.expressions.Window
      val scored = emb.crossJoin(broadcast(
          centroids.select(col("centroid_id"), col("centroid"))))
        .select(col("vec_id"), col("centroid_id"),
          (graft.functions.VecFunctions.vec_dot(col("embedding"), col("centroid")) /
            (Similarity.l2Norm("embedding") * Similarity.l2Norm("centroid"))).as("sim"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("vec_id", "centroid_id")
    }
    val got = lists.select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = windowed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("salted join equals plain join (skew mitigation correctness)") {
    val ev = graft.cdc.Cdc.walEvents(spark, sf001).select("lsn", "user_id", "event_id")
    val dim = Tables.events(spark, sf001)
      .select(col("user_id")).distinct().withColumn("tag", col("user_id") * 2)
    val plain = ev.join(dim, "user_id").select("lsn", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = graft.ops.Skew.saltedJoin(ev, dim, "user_id", salt = 8, saltSource = "event_id")
      .select("lsn", "tag").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }

  test("clusters assign one component per connected pair chain") {
    import spark.implicits._
    // path graph 1-2-3, separate pair 10-11 → components {1,2,3}, {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("large-star/small-star: path graph converges in <= log rounds with correct labels") {
    import spark.implicits._
    // 64-node path 1-2-...-64: diameter 63 — min-label propagation needs
    // ~63 rounds; the star alternation must stay logarithmic
    val path = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.clustersStarWithRounds(path)
    assert(rounds <= 10, s"star alternation took $rounds rounds on a 64-path")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
  }

  test("large-star/small-star equals min-label propagation on real jaccard pairs") {
    val pairs = Dedup.jaccardPairs(docs, n = 3, threshold10 = 4)
    val viaProp = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = Dedup.clustersStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaProp)
  }

  test("large-star/small-star: self-pair-only nodes keep their singleton label") {
    import spark.implicits._
    val pairs = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    val star = Dedup.clustersStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(star === prop, "output contract must match clusters()")
  }

  test("large-star/small-star: empty graph yields empty labels, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clustersStar(empty).count() === 0L)
  }

  test("clusters of an empty pair graph is empty, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clusters(empty).count() === 0L)
  }

  test("jaccardPairs leaves no lingering cached storage and reuses the self-join exchange") {
    docs.count() // materialize the spec's own fixture cache first
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.jaccardPairs(docs)
    assert(pairs.count() >= 0)
    // no NEW persistent storage may outlive the query (the ContextCleaner
    // may concurrently release older test RDDs, so compare sets, not size)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"jaccardPairs registered lingering cached RDDs: $added")
    // the two sides of the shingle self-join share one shuffle — visible
    // once tiny-data broadcasts are off (the 100 TB join shape)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Dedup.jaccardPairs(docs).queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"self-join sides must reuse the shingle exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("shingle df-cap is a no-op below the cap and prunes hot shingles above it") {
    // at sf0.001 no shingle is near df=50, so capped ≡ uncapped
    val uncapped = Dedup.jaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(docs, dfCap = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped)
    // a cap of 1 removes every shared shingle → no candidate pairs at all
    assert(Dedup.jaccardPairs(docs, dfCap = 1).count() === 0L)
  }

  test("bucketed co-located join plans with zero Exchange (100 TB fact-join path)") {
    val s = spark
    // fresh location per run: the in-memory catalog forgets tables
    // between JVMs but their files would survive in a fixed directory
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    s.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket LOCATION '$wh'")
    s.sql("DROP TABLE IF EXISTS graft_bucket.events_b")
    s.sql("DROP TABLE IF EXISTS graft_bucket.sessions_b")
    val ev = graft.cdc.Cdc.walEvents(s, sf001).select("lsn", "user_id", "value")
    val sess = graft.cdc.Cdc.sessionize(graft.cdc.Cdc.walEvents(s, sf001))
    graft.ops.Bucketing.writeBucketed(ev, "graft_bucket.events_b", "user_id", 8)
    graft.ops.Bucketing.writeBucketed(sess, "graft_bucket.sessions_b", "user_id", 8)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast+AQE so the plan shows the raw join strategy
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = graft.ops.Bucketing.coLocatedJoin(
        s, "graft_bucket.events_b", "graft_bucket.sessions_b", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("cosine top-k ranks are 1..k and neighbors are distinct") {
    val emb = Tables.embeddings(spark, sf001)
    val topk = Similarity.cosineTopK(emb.filter(col("vec_id") < 5), emb, 3).collect()
    assert(topk.length === 15)
    val byQ = topk.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(Array(1, 2, 3)))
      val cosines = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "descending cosine")
    }
  }

  test("bloomPrune equals the plain anti-join and is exact at any fpp") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(col("doc_id") < 300)
    // batch: 10 docs whose text duplicates history + the genuinely new rest
    val dups = history.limit(10).withColumn("doc_id", col("doc_id") + 100000)
    val batch = docs.filter(col("doc_id") >= 300).unionByName(dups)
    val expected = batch.as("b").join(history.as("h"),
        col("b.text") === col("h.text"), "left_anti")
      .select(col("b.doc_id")).collect().map(_.getLong(0)).toSet
    for (fpp <- Seq(0.01, 0.5); shards <- Seq(1, 4)) {
      // exactness must not depend on fpp OR the shard count: hash-range
      // sharding routes each key to exactly one filter, and the confirm
      // join restores exactness whatever the filters answer
      val got = Dedup.bloomPrune(batch, history, fpp = fpp, shards = shards)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got === expected, s"fpp=$fpp shards=$shards")
    }
    // sharded and single-bloom forms are identical operators
    val one = Dedup.bloomPrune(batch, history).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val eight = Dedup.bloomPrune(batch, history, shards = 8).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(one === eight)
    // empty history stays a pass-through on the sharded path too
    val none = Dedup.bloomPrune(batch, history.filter(lit(false)), shards = 4)
    assert(none.count() === batch.count())
  }

  test("bloomPrune: empty history passes the batch through; NULL text never matches") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf001)
    // empty history — the zero-item bloom evaluates to NULL; the op must
    // pass everything through, not swallow the batch
    val emptyHist = docs.filter(lit(false))
    val through = Dedup.bloomPrune(docs.limit(50), emptyHist)
    assert(through.count() === 50)
    // NULL-text rows: never a duplicate of anything (anti-join equality
    // semantics, not SQL NOT IN) — survives even when history also has a
    // NULL-text row
    val schema = docs.schema
    def withNullText(base: org.apache.spark.sql.DataFrame, id: Long) =
      base.limit(1).select(lit(id).as("doc_id"),
        lit(null).cast("string").as("text"),
        col("lang"), col("source"), col("n_chars"))
    val history = docs.filter(col("doc_id") < 100).unionByName(withNullText(docs, 900000))
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .unionByName(withNullText(docs, 900001))
    val kept = Dedup.bloomPrune(batch, history).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(900001L), "null-text batch row must survive")
    assert(kept.size === 21)
  }

  test("bloomPrune drops every planted content dup and keeps schema") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(col("doc_id") < 100)
    val dups = history.withColumn("doc_id", col("doc_id") + 100000)
    val kept = Dedup.bloomPrune(dups, history)
    assert(kept.count() === 0, "every batch doc duplicates history")
    assert(kept.columns.sameElements(docs.columns), "schema passes through")
  }

  test("semanticDupPairs stays within clusters and finds planted duplicate vectors") {
    val emb = Tables.embeddings(spark, sf001)
    val doubled = emb.limit(20)
      .unionByName(emb.limit(20).withColumn("vec_id", col("vec_id") + 10000))
    val pairs = Dedup.semanticDupPairs(doubled, nClusters = 8, threshold = 0.999)
    val rows = pairs.collect()
    // identical vectors always share a cluster (argmax is deterministic on
    // identical input) and have cosine 1 ≥ any threshold
    val planted = (0 until 20).map(i => (i.toLong, i + 10000L)).toSet
    val found = rows.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(planted.subsetOf(found), s"missing ${planted -- found}")
    // every pair's sides really were assigned to the reported cluster
    val assigned = Similarity.ivfAssignWithSim(doubled,
        doubled.orderBy(col("vec_id")).limit(8)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid")))
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(assigned(r.getLong(1)) === r.getLong(0))
      assert(assigned(r.getLong(2)) === r.getLong(0))
    }
  }

  test("semanticPrune keeps exactly one side of each planted identical pair") {
    val emb = Tables.embeddings(spark, sf001)
    val doubled = emb.limit(20)
      .unionByName(emb.limit(20).withColumn("vec_id", col("vec_id") + 10000))
    val kept = Dedup.semanticPrune(doubled, nClusters = 8, threshold = 0.999)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    (0 until 20).foreach { i =>
      val (lo, hi) = (i.toLong, i + 10000L)
      // identical vectors tie on centroid_sim → the higher id drops
      assert(kept.contains(lo) && !kept.contains(hi),
        s"tie policy must keep $lo and drop $hi")
    }
  }

  test("plan shapes: semantic assign broadcasts (no cartesian), bloom prefilter is scan-level, bm25 broadcasts df") {
    val emb = Tables.embeddings(spark, sf001)
    // SemDeDup assignment rides the one-row broadcast centroid array —
    // a BroadcastNestedLoopJoin against ONE row, never CartesianProduct.
    // (balanceFactor = 0 exposes the raw plan; the default guard pins
    // the assignment behind a localCheckpoint, hiding the BNLJ from the
    // final plan string)
    val rawPlan = Dedup.semanticDupPairs(emb, 8, 0.9, balanceFactor = 0)
      .queryExecution.executedPlan.toString
    assert(rawPlan.contains("BroadcastNestedLoopJoin"))
    assert(!rawPlan.contains("CartesianProduct"),
      s"semantic pair generation must never go all-pairs:\n$rawPlan")
    val pairsPlan = Dedup.semanticDupPairs(emb, 8, 0.9)
      .queryExecution.executedPlan.toString
    assert(!pairsPlan.contains("CartesianProduct"))
    val docs = Tables.documents(spark, sf001)
    // bloom probe compiles to the codegen might_contain kernel in a
    // narrow Filter (no join for the definitely-new branch)
    val bloomPlan = Dedup.bloomPrune(
        docs.filter(col("doc_id") >= 300), docs.filter(col("doc_id") < 300))
      .queryExecution.executedPlan.toString
    assert(bloomPlan.contains("might_contain"),
      s"bloom prefilter must appear as a filter kernel:\n$bloomPlan")
    assert(!bloomPlan.contains("CartesianProduct"))
    // BM25's document-frequency side joins back via broadcast
    val bm25Plan = graft.ops.TextAnalysis.bm25TopK(docs, Seq("hash"), 5)
      .queryExecution.executedPlan.toString
    assert(bm25Plan.contains("BroadcastHashJoin"),
      s"df join-back must broadcast:\n$bm25Plan")
    assert(bm25Plan.contains("TakeOrderedAndProject"),
      s"global top-k must be a heap take, not a sort:\n$bm25Plan")
  }

  test("IVF-PQ: neighbors come from probed lists with full-ADC-identical scores") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val ivfpq = Similarity.ivfPqTopK(q, emb, 10, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivfpq.nonEmpty)
    // full ADC over the whole corpus: every IVF-PQ hit must carry the
    // IDENTICAL asymmetric-distance score (routing prunes candidates,
    // never changes a surviving candidate's score)
    val fullAdc = Similarity.pqAdcTopK(q, emb, 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivfpq.foreach { case (key, s) =>
      assert(fullAdc.contains(key), s"pair $key missing from full ADC")
      assert(fullAdc(key) === s, s"score drift for $key")
    }
    // neighbors really are restricted to the probed lists: exact IVF
    // with k ≥ corpus returns EVERY candidate in the probed lists, so
    // IVF-PQ's pairs must be a subset of that candidate set
    val ivfCandidates = Similarity.ivfTopK(q, emb, 500, nLists = 16, nProbe = 4)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ivfpq.keys.foreach { key =>
      assert(ivfCandidates.contains(key), s"$key scored outside the probed lists")
    }
  }

  test("edge inputs: short docs and empty frames never crash the new dedup ops") {
    import spark.implicits._
    val shorties = Seq((1L, "a b"), (2L, ""), (3L, "one two three four")).toDF("doc_id", "text")
    // every doc shorter than k yields no k-grams → no fingerprints, no pairs
    assert(Dedup.winnowingFingerprints(shorties, k = 5, w = 4).count() === 0)
    assert(Dedup.winnowingPairs(shorties, k = 5, w = 4).count() === 0)
    assert(Dedup.containmentPairs(shorties, n = 3).count() === 0,
      "no shared shingles among distinct short docs")
    val empty = shorties.filter(lit(false))
    assert(Dedup.winnowingFingerprints(empty).count() === 0)
    assert(Dedup.containmentPairs(empty).count() === 0)
    assert(Dedup.normalizedExact(empty).count() === 0)
    assert(graft.ops.TextAnalysis.topNgrams(empty, 3, 5).count() === 0)
    assert(graft.ops.TextAnalysis.corpusDiff(empty, empty).count() === 0)
    assert(graft.ops.TextAnalysis.scriptProfile(empty).count() === 0)
    // DSIR with an empty target: every weight is 0, scores are 0 — defined
    val docs = Tables.documents(spark, sf001).limit(20)
    val z = graft.ops.TextAnalysis.dsirScores(docs, empty).collect()
    assert(z.nonEmpty && z.forall(_.getLong(1) === 0L))
  }

  test("containment catches an embedded doc that symmetric Jaccard misses") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val pair = Seq(
      (1L, small),                       // fully contained in 2
      (2L, s"$filler $small"),           // much larger host
      (3L, "entirely different tokens here okay")
    ).toDF("doc_id", "text")
    // symmetric Jaccard at 0.4: shared=4 shingles, |A|=4, |B|=64
    // (66 tokens → 64 trigrams) → 4*10 < 4*(4+64-4)=256 — missed
    assert(Dedup.jaccardPairs(pair, n = 3, threshold10 = 4).count() === 0)
    // containment at 0.8: shared*10 >= 8*min(4,62) — caught, small side named
    val got = Dedup.containmentPairs(pair, n = 3, threshold10 = 8).collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1)) === (1L, 2L))
    assert(got(0).getAs[Long]("contained") === 1L)
  }

  test("winnowing: a shared passage of length k+w-1 guarantees a shared fingerprint") {
    import spark.implicits._
    // k=5, w=4 → guarantee threshold k+w-1 = 8 shared tokens
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $passage four five six seven"),
      (2L, s"red green blue $passage yellow purple orange pink"),
      (3L, "totally unrelated words with no overlap at all here")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowingFingerprints(docs, k = 5, w = 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty,
      "8-token shared passage must share at least one fingerprint (SIGMOD'03 guarantee)")
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty,
      "no shared k-grams → no shared fingerprints")
    // winnowing SELECTS: far fewer fingerprints than windows on real docs
    val real = Tables.documents(spark, sf001)
    val nWindows = real.selectExpr("size(split(text, ' ')) - 5 - 4 + 2 AS n")
      .filter(col("n") > 0).agg(sum(col("n"))).head.getLong(0)
    val nFps = Dedup.winnowingFingerprints(real, 5, 4).count()
    assert(nFps < nWindows * 7 / 10,
      s"density: $nFps fingerprints over $nWindows windows should be well under 1")
    // pairs consumer finds the planted pair
    val pairs = Dedup.winnowingPairs(docs, k = 5, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("normalizedText: idempotent, and matches a reference fold on ASCII") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val asciiPrintable = (' ' to '~').mkString
    val strs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => asciiPrintable(rnd.nextInt(asciiPrintable.length))).mkString
    } :+ "" :+ "  A..B!!  c  " :+ "ÜBER çafé 中文"   // non-ASCII → spaces
    def ref(s: String): String =
      s.toLowerCase.map(c => if (('a' to 'z').contains(c) || c.isDigit && c < 128 || c == ' ') c else ' ')
        .replaceAll(" +", " ").trim
    val out = strs.toDF("text")
      .select(col("text"), Dedup.normalizedText(col("text")).as("norm"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    out.foreach { case (in, got) =>
      assert(got === ref(in), s"input ${in.map(_.toInt)}")
    }
    // idempotence: normalizing a normalized string is the identity
    val again = out.map(_._2).toSeq.toDF("text")
      .select(col("text"), Dedup.normalizedText(col("text")).as("norm"))
      .collect()
    again.foreach(r => assert(r.getString(1) === r.getString(0)))
  }

  test("normalizedExact merges case/punct/spacing variants that exact keeps apart") {
    val base = docs.limit(10)
    val variants = base.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat(upper(col("text")), lit("  !!")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val both = base.unionByName(variants)
    // raw exact: every variant is its own hash → 20 groups, no copies
    assert(Dedup.exact(both).filter(col("n_copies") > 1).count() === 0)
    // normalized: each (orig, variant) pair collapses into one group
    val norm = Dedup.normalizedExact(both)
    assert(norm.count() === 10)
    assert(norm.filter(col("n_copies") === 2).count() === 10)
    // keep-lowest policy: the original (lower) id survives
    assert(norm.filter(col("keep_id") >= 100000).count() === 0)
  }

  test("semanticPruneIncremental drops history near-dups, never batch-internal ones") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val history = emb.filter(col("vec_id") < 100)
    // batch: copies of history vectors (must drop) + twin batch-only
    // vectors that duplicate EACH OTHER but nothing in history (must
    // both survive — the batch is never self-compared)
    val histCopies = history.limit(5).withColumn("vec_id", col("vec_id") + 10000)
    val batchTwinA = emb.filter(col("vec_id") === 400)
      .withColumn("vec_id", lit(20000L))
    val batchTwinB = emb.filter(col("vec_id") === 400)
      .withColumn("vec_id", lit(20001L))
    val batch = histCopies.unionByName(batchTwinA).unionByName(batchTwinB)
    val kept = Dedup.semanticPruneIncremental(batch, history,
        nClusters = 8, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    (0 until 5).foreach(i => assert(!kept.contains(i + 10000L),
      s"history copy ${i + 10000} must drop"))
    assert(kept.contains(20000L) && kept.contains(20001L),
      "batch-internal twins survive: batch never self-compares")
  }

  test("semanticPrune drop set matches a direct recomputation from the pairs") {
    val emb = Tables.embeddings(spark, sf001)
    val pairs = Dedup.semanticDupPairs(emb, nClusters = 8, threshold = 0.4).collect()
    val expectedDrops = pairs.flatMap { r =>
      val (a, b, sa, sb) = (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))
      if (sb < sa) Some(a)                   // a beaten strictly
      else if (sa < sb) Some(b)              // b beaten strictly
      else Some(b)                           // tie: higher id drops (a < b)
    }.toSet
    val all = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val kept = Dedup.semanticPrune(emb, nClusters = 8, threshold = 0.4)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept === (all -- expectedDrops))
  }

  test("threshold sweep predicts semanticPrune exactly at every aligned threshold") {
    val emb = Tables.embeddings(spark, sf001)
    val sweep = Dedup.semanticThresholdSweep(emb, nClusters = 8,
      tauFloor = 0.2, step = 0.05)
      .collect().map(r => r.getAs[Long]("threshold_milli") ->
        (r.getAs[Long]("pairs_at_or_above"), r.getAs[Long]("docs_dropped_at_or_above"))).toMap
    val total = emb.count()
    for (milli <- Seq(400L, 600L, 900L) if sweep.contains(milli)) {
      val tau = milli / 1000.0
      val wantPairs = Dedup.semanticDupPairs(emb, nClusters = 8, threshold = tau).count()
      val wantDrops = total -
        Dedup.semanticPrune(emb, nClusters = 8, threshold = tau).count()
      assert(sweep(milli)._1 === wantPairs, s"pairs at tau=$tau")
      assert(sweep(milli)._2 === wantDrops,
        s"docs dropped at tau=$tau must equal what semanticPrune removes")
    }
  }

  test("adaptive clusters: long path graph falls back to star and finishes in <= log rounds end-to-end") {
    import spark.implicits._
    val n = 200
    val path = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val (labels, usedStar, rounds) = Dedup.clustersAdaptiveWithInfo(path)
    assert(usedStar, "a diameter-199 path must trip the probe and fall back to star")
    val bound = 5 + 2 * (math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 2)
    assert(rounds <= bound, s"adaptive total rounds $rounds must stay within $bound")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === n)
    assert(got.forall(_._2 === 0L), "one path component, min label 0")
    // a real near-dup graph converges inside the probe — no fallback
    val real = Dedup.jaccardPairs(docs, n = 3, threshold10 = 4)
    val (realLabels, realStar, _) = Dedup.clustersAdaptiveWithInfo(real)
    assert(!realStar, "tiny-diameter graphs stay on min-label propagation")
    val expect = Dedup.clustersStar(real).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(realLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
  }

  test("default df-cap: a planted viral shingle is dropped as boilerplate, true dups still pair") {
    import spark.implicits._
    // 2100 docs share one boilerplate 3-gram (df > DefaultDfCap=2000):
    // uncapped, that single join key fans out to ~2.2M rows in ONE task;
    // the DEFAULT now excises it while unique-content dups still pair
    val viral = (0 until 2100).map(i => (5000L + i, s"spam spam spam u$i"))
      .toDF("doc_id", "text")
    val twins = Seq((9000L, "alpha beta gamma delta"),
                    (9001L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val all = viral.unionByName(twins)
    assert(Dedup.shingles(all, 3).filter(col("shingle") === "spam spam spam")
      .count() === 2100L, "fixture: the viral shingle must exceed the cap")
    val pairs = Dedup.jaccardPairs(all, n = 3, threshold10 = 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((9000L, 9001L)),
      "default cap: only the unique-content twins pair; no viral-gram blowup")
  }

  test("edge inputs: sweep/chunk-dedup/LM ops are defined no-ops on empty or tiny frames") {
    import spark.implicits._
    val emptyEmb = Tables.embeddings(spark, sf001).filter(lit(false))
    assert(Dedup.semanticThresholdSweep(emptyEmb, nClusters = 4).count() === 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.chunkDedup(emptyDocs).count() === 0)
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(one).head
    assert(got.getAs[String]("cleaned") === "solo" && got.getAs[Long]("n_chunks") === 1L)
  }

  test("edit-distance pairs: substitutions within k caught, beyond-k and hot blocks excluded") {
    import spark.implicits._
    val titles = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brawn fox"),   // 1 substitution from 1
      (3L, "the quick brawn fax"),   // 2 subs from 1, 1 from 2
      (4L, "completely different!"),  // same length as nothing relevant
      (5L, "xhe quick brown foz")    // 2 subs from 1
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(titles, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === Map(
      (1L, 2L) -> 1, (1L, 3L) -> 2, (2L, 3L) -> 1, (1L, 5L) -> 2))
    // (2,5) and (3,5) are distance 3: candidates via shared segments is
    // fine, but the exact verify must reject them
    assert(!got.contains((2L, 5L)) && !got.contains((3L, 5L)))
    // a hot segment above the cap is excised: 3000 strings sharing one
    // aligned segment must not fan out quadratically
    val viral = (0 until 3000).map(i => (100L + i, f"AAAA$i%04d")).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(viral, k = 1, dfCap = 2000).count() === 0L)
    // same fixture under the cap still pairs (e.g. 0001 vs 1001 ids differ
    // by digits): sanity that the cap, not the verify, did the excision
    val small = (0 until 20).map(i => (100L + i, f"AAAA000$i%d")).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(small, k = 1, dfCap = 0).count() > 0L)
    // strings SHORTER than k+1 are not dropped: with L <= k every
    // same-length pair is within k substitutions — whole-length block
    val short = Seq((1L, "abc"), (2L, "abc"), (3L, "abd"), (4L, "xxxxxxxx"))
      .toDF("doc_id", "text")
    val shortPairs = Dedup.editDistancePairs(short, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(shortPairs === Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1))
  }

  test("edit-distance pairs: precision 1 and hamming-complete recall vs brute force on random corpora") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def ham(a: String, b: String): Int =
      if (a.length != b.length) Int.MaxValue
      else a.zip(b).count { case (x, y) => x != y }
    val rnd = new scala.util.Random(7)
    val strs = (0 until 60).map(i =>
      i.toLong -> (0 until 10).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val got = Dedup.editDistancePairs(strs.toDF("doc_id", "text"), k = 3, dfCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = (for {
      (i, si) <- strs; (j, sj) <- strs if i < j
      d = lev(si, sj) if d <= 3
    } yield (i, j) -> d).toMap
    // precision 1: every reported pair is a true <= k pair with the
    // true distance
    got.foreach { case (p, d) => assert(brute.get(p).contains(d), s"pair $p") }
    // recall contract: every pair within k SUBSTITUTIONS is found
    // (indel-shifted pairs may escape the blocking — documented)
    strs.foreach { case (i, si) => strs.foreach { case (j, sj) =>
      if (i < j && ham(si, sj) <= 3)
        assert(got.contains((i, j)), s"hamming-close pair ($i,$j) must be blocked together")
    } }
    assert(got.nonEmpty && brute.nonEmpty, "fixture must exercise real pairs")
  }

  test("exact-mean kmeans is bit-identical across partitionings (the cluster-layout determinism contract)") {
    val emb = Tables.embeddings(spark, sf001)
    def fit(parts: Int): Map[Long, Seq[Float]] =
      Similarity.kmeansCentroids(emb.repartition(parts), 8, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val c1 = fit(1)
    val c32 = fit(32)
    assert(c1.keySet === c32.keySet)
    c1.foreach { case (id, v) =>
      assert(v === c32(id), s"centroid $id drifted with partition count — " +
        "float-avg association order leaked into the quantizer")
    }
  }

  /** Adversarial skew fixture: 300 jittered copies of vector 0 — the
    * seeded quantizer routes the whole blob to one inverted list. */
  private def skewedEmb = {
    val emb = Tables.embeddings(spark, sf001)
    val blob = emb.filter(col("vec_id") === 0)
      .crossJoin(spark.range(1000, 1300))
      .select(col("id").as("vec_id"),
        transform(col("embedding"),
          v => (v + (pmod(col("id"), lit(7)).cast("float") / lit(1000.0f)))
            .cast("float")).as("embedding"),
        col("label"))
    emb.unionByName(blob)
  }

  test("balance guard: hot seeded list is flagged and salt-split, probe results identical, task keys bounded") {
    val sk = skewedEmb
    val seedCent = sk.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val assigned = Similarity.ivfAssignWith(sk, seedCent)
    // n=800, k=8, factor 2 → cap 200; the ~301-member blob list trips it
    val salts = Similarity.listSaltCounts(assigned, 8, 2.0)
    assert(salts.nonEmpty, "the blob inverted list must be flagged as hot")
    // exact per-(list, salt) sizes after the split stay within cap
    val cap = math.max(1L, (2.0 * assigned.count() / 8).toLong)
    val nSalt = coalesce(element_at(typedLit(salts), col("centroid_id")), lit(1)).cast("long")
    val worstAfter = assigned
      .withColumn("salt", pmod(xxhash64(col("vec_id")), nSalt))
      .groupBy(col("centroid_id"), col("salt")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(worstAfter <= cap + cap / 2, // hash spread, not exact quota
      s"salted groups must be near-cap: worst=$worstAfter cap=$cap")
    // guarded probe search ≡ unguarded (identical candidate set)
    val queries = sk.filter(col("vec_id") < 10)
    val guarded = Similarity.ivfTopK(queries, sk, 5, nLists = 8, nProbe = 2,
        kmeansIters = 0, balanceFactor = 0.5).collect().map(_.toSeq).toSet
    val plain = Similarity.ivfTopK(queries, sk, 5, nLists = 8, nProbe = 2,
        kmeansIters = 0, balanceFactor = 0).collect().map(_.toSeq).toSet
    assert(guarded === plain, "salt split must not change the ranking")
  }

  test("semanticDupPairs 2-D block decomposition equals the plain within-cluster join") {
    val emb = Tables.embeddings(spark, sf001)
    // balanceFactor small enough that EVERY cluster decomposes
    val decomposed = Dedup.semanticDupPairs(emb, nClusters = 8, threshold = 0.4,
        balanceFactor = 0.05).collect().map(_.toSeq).toSet
    val plain = Dedup.semanticDupPairs(emb, nClusters = 8, threshold = 0.4,
        balanceFactor = 0).collect().map(_.toSeq).toSet
    assert(decomposed === plain,
      "block decomposition must emit every pair exactly once")
  }

  test("semanticPruneIncremental: shuffled fallback equals broadcast path; streaming past cap fails loudly") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val history = emb.filter(col("vec_id") < 100)
    val batch = emb.filter(col("vec_id") >= 400)
    val viaBroadcast = Dedup.semanticPruneIncremental(batch, history,
        nClusters = 8, threshold = 0.4)
      .select("vec_id").as[Long].collect().toSet
    val viaFallback = Dedup.semanticPruneIncremental(batch, history,
        nClusters = 8, threshold = 0.4, maxBroadcastBytes = 1L)
      .select("vec_id").as[Long].collect().toSet
    assert(viaFallback === viaBroadcast,
      "past the broadcast cap the shuffled within-cluster join must keep the same survivors")
    val streamBatch = spark.readStream.format("rate").load()
      .select(col("value").as("vec_id"),
        array(lit(0.1f), lit(0.2f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticPruneIncremental(streamBatch, history,
        nClusters = 8, threshold = 0.4, maxBroadcastBytes = 1L)
    }
    assert(e.getMessage.contains("maxBroadcastBytes"),
      "a streaming batch past the cap must fail loudly, not silently shuffle")
  }

  test("cdcChunkDedup: content-anchored boundaries survive a front insertion " +
    "where fixed-width chunking loses every downstream chunk") {
    import spark.implicits._
    val base = Tables.documents(spark, sf001)
      .filter(col("doc_id") === 0L).head.getAs[String]("text")
    val docs = Seq((0L, base), (1L, "zzz qqq " + base)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(docs, w = 3, maskBits = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1's chunks past the first boundary are identical token runs →
    // they dedup against doc 0 despite the 2-token front insertion
    assert(cdc(1L)._2 < cdc(1L)._1,
      s"CDC chunking must dedup shifted content, got $cdc")
    assert(cdc(0L)._2 === cdc(0L)._1, "first occurrence keeps everything")
    // fixed-width chunking: the same insertion shifts every chunk key
    val fixed = Dedup.chunkDedup(docs, chunkTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fixed(1L)._2 === fixed(1L)._1,
      s"fixed chunking keeps all of doc 1 (nothing aligns), got $fixed")
  }

  test("lshEval: counts tie out against the two pair sets; imperfect precision surfaces") {
    import spark.implicits._
    // two true near-dups (one token differs) + a medium-similarity pair
    // engineered to collide in SOME band without clearing jaccard 0.4:
    // low-row banding (rows=1 → 16 bands) fires on ANY shared min-hash
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base.replace("tok7", "tokX")),
      // 15 shared leading tokens ⇒ 13 shared shingles, jaccard ≈ 0.30:
      // under threshold10=4 (not a true pair) yet nearly certain to share
      // at least one of 16 single-row band min-hashes
      (3L, ((1 to 15).map(i => s"tok$i") ++ (1 to 15).map(i => s"uuu$i")).mkString(" ")),
      (4L, (1 to 30).map(i => s"yyy$i").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.lshEval(docs, rows = 1).head()
    val (nT, nC, nH) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_hits"))
    assert(nH <= math.min(nT, nC))
    assert(nT === Dedup.jaccardPairs(docs, 3, 4).count())
    assert(nC === Dedup.minhashLshPairs(docs, rows = 1).count())
    assert(nC > nT, "rows=1 banding must overfire on the partial-overlap doc")
    assert(r.getAs[Long]("precision_ppm") < 1000000L)
    assert(r.getAs[Long]("recall_ppm") === 1000000L, "true pair shares 16/16 minhashes")
  }

  test("paragraph-granularity minhash catches a shared paragraph doc-level LSH misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two long documents, unrelated except ONE identical 16-token
    // paragraph (chunk 1 of each): doc-level signatures are dominated
    // by the unrelated text, paragraph units collide exactly
    val para = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val docs = Seq(
      (1L, ((1 to 16).map(i => s"aaa$i").mkString(" ") + " " + para + " " +
        (1 to 16).map(i => s"bbb$i").mkString(" "))),
      (2L, ((1 to 16).map(i => s"ccc$i").mkString(" ") + " " + para + " " +
        (1 to 16).map(i => s"ddd$i").mkString(" ")))).toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(docs).count() === 0L,
      "doc-level LSH must not fire on 1/3 overlap at 4-row banding")
    val units = graft.ops.TextAnalysis.chunk(docs, width = 16, overlap = 0)
      .select((col("doc_id") * 1000 + col("chunk_no")).as("doc_id"),
        col("chunk_text").as("text"))
    val pairs = Dedup.minhashLshPairs(units)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1001L, 2001L)),
      "exactly the two shared-paragraph units (chunk 1 of each doc) collide")
  }

  test("clustersContracted ≡ clusters over the edge union (quotient-graph exactness)") {
    // the web_joint_dedup rewrite's correctness contract: contracting
    // URL groups to their min-id anchors before CC yields EXACTLY the
    // components of (URL star edges ∪ LSH pairs) — on real sf0.001
    // documents AND on a hand-built adversarial case where an LSH edge
    // bridges two URL groups through NON-anchor members
    import spark.implicits._
    val synthUrl = concat(lit("https://h"), pmod(col("doc_id"), lit(40)),
      lit(".example/p/"), pmod(col("doc_id"), lit(173)))
    val withUrl = docs.select(col("doc_id"), graft.ops.Web.urlNormalize(synthUrl).as("u"))
    val ka = withUrl.groupBy(col("u")).agg(min(col("doc_id")).as("ka"))
    val anchors = withUrl.join(ka, "u").select(col("doc_id"), col("ka").as("anchor"))
    val lsh = Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b"))
    val unionPairs = withUrl.join(ka, "u").filter(col("doc_id") > col("ka"))
      .select(col("ka").as("doc_a"), col("doc_id").as("doc_b"))
      .unionByName(lsh).distinct()
    val plain = Dedup.clusters(unionPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val contracted = Dedup.clustersContracted(lsh, anchors)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contracted === plain)
    // adversarial: groups {0,10,20} (anchor 0) and {5,15} (anchor 5)
    // bridged by an LSH edge between non-anchors 20 and 15; the
    // untouched singleton 7 must NOT appear (edge-free vertex)
    val handAnchors = Seq((0L, 0L), (10L, 0L), (20L, 0L), (5L, 5L), (15L, 5L), (7L, 7L))
      .toDF("doc_id", "anchor")
    val handLsh = Seq((15L, 20L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersContracted(handLsh, handAnchors)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 10L -> 0L, 20L -> 0L, 5L -> 0L, 15L -> 0L))
  }
}
