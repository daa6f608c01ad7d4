package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline over
  * `documents`. Scale stance (100 TB): everything here avoids the O(n²)
  * cross join — candidates come from equi-joins on shingles / LSH band
  * buckets / SimHash bands, which shuffle on the bucket key and stay
  * linear in the number of true collisions.
  */
object Dedup {

  /** Default document-frequency cap for the shingle-pair family. A
    * shingle in f documents contributes f² join rows through one key,
    * so the bound a single task can absorb is a property of the
    * EXECUTOR, not the corpus: 2000² = 4M rows per hottest key at any
    * corpus size. Shingles above the cap are boilerplate by definition
    * (stop-shingle practice); exempting them trades a sliver of recall
    * on pathological docs for never serializing one partition at
    * 100 TB. Pass `Unbounded` to opt out EXPLICITLY — the unprotected
    * configuration should never be the one a user runs by accident.
    */
  val DefaultDfCap = 2000

  /** The edit-distance blocker's OWN default cap — tighter than the
    * shingle family's because its geometry is harsher: every string
    * contributes k+1 short aligned segments, and short segments over a
    * skewed title corpus go hot far sooner than 7-gram shingles. The
    * sf0.8 synthetic-decade forensics (SCALING.md): candidate growth at
    * cap 2000 rode the pre-cap quadratic regime (slope 1.21, 838 K →
    * 54.6 M candidates) while cap 250 is flat (0.15) and — measured —
    * OUTPUT-IDENTICAL at sf0.01/sf0.1: every segment block the tighter
    * cap excises is boilerplate whose survivors the levenshtein verify
    * rejects anyway. The scale-safe posture is therefore the default;
    * pass a wider cap explicitly to lean recall on small corpora.
    */
  val EditDistanceDfCap = 250

  /** Explicit opt-out for the df-cap defaults. */
  val Unbounded: Int = Int.MaxValue

  /** Exact dedup: content-hash groupBy, keep lowest id. One shuffle on
    * the hash; map-side partial agg makes the reduce side tiny.
    */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Canonical text normalization for dedup keys: lowercase, map
    * non-alphanumerics to spaces (ASCII classes — engine-neutral regex),
    * collapse runs, trim. The C4/RefinedWeb exact-dedup form hashes THIS,
    * not the raw text, so case/punctuation/spacing variants collapse.
    * Narrow codegen'd per-row transform; non-ASCII letters are mapped to
    * spaces too (documented: the conservative choice for a hash key —
    * it merges more, never less, than a Unicode-aware fold).
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Exact dedup over the NORMALIZED text — same one-shuffle groupBy
    * shape as [[exact]], different key.
    */
  def normalizedExact(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(normalizedText(col(textCol))).as("norm_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-substring span dedup (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" form, published
    * method): any `n`-token window occurring more than once in the
    * corpus is a duplicated span; every occurrence except the FIRST
    * (lowest (doc_id, start)) gets its tokens removed, and each
    * document is reassembled from its surviving tokens. The guarantee
    * is per WINDOW — the first occurrence of each window keeps its
    * tokens. When distinct duplicated windows overlap, a retained
    * passage can still be eroded by a removal that covers part of it
    * (greedy span removal has this artifact in the paper's form too);
    * what is guaranteed is that a token is only ever removed because
    * some window containing it appeared earlier elsewhere.
    *
    * Scale shape: duplicate detection is one gram-partitioned window
    * pass (bounded keys, same posture as the shingle family), the
    * coverage set is a (doc, pos) distinct, and reassembly is one
    * groupBy(doc). No all-pairs anywhere. The suffix-array construction
    * the paper uses is a single-machine algorithm; the windowed
    * formulation is the shuffle-bounded distributed equivalent for
    * fixed n. `dfCap > 0` exempts ultra-hot grams (boilerplate
    * occurring more than dfCap times) from removal — they would
    * otherwise serialize one window partition into a single task at
    * web scale; exempted grams keep all copies (conservative).
    */
  def substringSpans(df: DataFrame, n: Int = 10, textCol: String = "text",
      idCol: String = "doc_id", dfCap: Int = DefaultDfCap): DataFrame = {
    val toks = df.select(col(idCol), split(col(textCol), " ").as("t"))
    val tok = toks.select(col(idCol), posexplode(col("t")).as(Seq("pos", "tok")))
    // codegen NGramsJoin kernel (empty for short docs, so no
    // descending-sequence hazard); posexplode index = 0-based window start
    val wins = toks.select(col(idCol),
      posexplode(graft.functions.TextFunctions.ngrams_join(col("t"), n))
        .as(Seq("start", "gram")))
    // ONE shuffle on gram: first-occurrence rank in the window
    // partition (a groupBy + join-back would scan and shuffle the
    // window set twice for the same answer). rn > 1 alone implies the
    // gram is duplicated — no separate count pass needed.
    val wGram = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val wOrd  = wGram.orderBy(col(idCol), col("start"))
    val ranked = wins.withColumn("rn", row_number().over(wOrd))
    val marked =
      if (dfCap > 0 && dfCap != Unbounded)
        ranked.withColumn("c", count(lit(1)).over(wGram))
          .filter(col("rn") > 1 && col("c") <= dfCap)
      else ranked.filter(col("rn") > 1)
    val covered = marked
      .select(col(idCol), explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .distinct()
    rebuildUncovered(df, tok, covered, textCol, idCol)
  }

  /** Shared span-removal tail: anti-join token positions against the
    * covered set, reassemble survivors in position order, and re-attach
    * docs that lost every gram (or had none). Used by the cross-doc
    * [[substringSpans]] and the within-doc [[selfDedupSpans]]. */
  private def rebuildUncovered(df: DataFrame, tok: DataFrame, covered: DataFrame,
                               textCol: String, idCol: String): DataFrame = {
    val rebuilt = tok.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("cleaned"))
    df.select(col(idCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** WITHIN-document repeated-span removal: every occurrence of an
    * n-gram AFTER its first occurrence in the same document is a
    * repeat; tokens covered only by repeats are dropped and the doc is
    * reassembled from the survivors. The intra-doc complement of
    * [[substringSpans]] (which dedups across the corpus) and the
    * REWRITE form of `TextAnalysis.repetitionMetrics` (which only
    * scores): the standard self-repetition trim before quality gates,
    * since looping generator output and boilerplate chains repeat long
    * spans inside one page.
    *
    * Scale shape: the first-occurrence window is keyed by
    * `(doc, gram)` — unlike the cross-doc op there is NO viral-gram
    * skew and no df-cap to tune, because a partition never outgrows one
    * document's occurrence list. Coverage distinct and the rebuild
    * anti-join are keyed by doc; everything distributes on the corpus's
    * natural key.
    */
  def selfDedupSpans(df: DataFrame, n: Int = 10, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol), split(col(textCol), " ").as("t"))
    val tok = toks.select(col(idCol), posexplode(col("t")).as(Seq("pos", "tok")))
    val wins = toks.select(col(idCol),
      posexplode(graft.functions.TextFunctions.ngrams_join(col("t"), n))
        .as(Seq("start", "gram")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("gram")).orderBy(col("start"))
    val covered = wins.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col(idCol), explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .distinct()
    rebuildUncovered(df, tok, covered, textCol, idCol)
  }

  /** Chunk-level exact dedup — the Dolma/RefinedWeb PARAGRAPH-dedup
    * granularity, with fixed `chunkTokens`-token windows standing in
    * for paragraph boundaries (this corpus has no newline structure;
    * real text would split on "\n\n" first — the dedup mechanics are
    * boundary-agnostic). Each document becomes its sequence of
    * non-overlapping chunks (last partial chunk kept); a chunk whose
    * text already occurred earlier in the corpus — lower (doc_id,
    * chunk_idx) — is removed; survivors reassemble in order. Exactly
    * the [[exact]] hash-groupBy posture applied inside documents: one
    * window pass over (chunk-hash) for first-occurrence ranking, one
    * groupBy(doc) reassembly; no pairwise anything.
    */
  def chunkDedup(df: DataFrame, chunkTokens: Int = 20, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, s"chunkDedup: chunkTokens=$chunkTokens must be positive")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("t"))
    val chunks = toks.select(col(idCol),
      posexplode(transform(
        expr(s"sequence(0, (size(t) - 1) div $chunkTokens)"),
        i => array_join(slice(col("t"), i * chunkTokens + 1, lit(chunkTokens)), " ")))
        .as(Seq("chunk_idx", "chunk")))
    val w = Window.partitionBy(col("chunk")).orderBy(col(idCol), col("chunk_idx"))
    val kept = chunks.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_chunks"),
        array_join(transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk")), " ").as("cleaned"))
    df.select(col(idCol),
        expr(s"CAST(((size(split(`$textCol`, ' ')) - 1) div $chunkTokens) + 1 AS BIGINT)")
          .as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept_chunks"), lit(0L)).as("n_kept_chunks"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Word n-gram shingles, distinct per doc: (doc_id, shingle) pairs.
    * Gram generation is the codegen `NGramsJoin` kernel (identical
    * output to the interpreted `transform(sequence…)` formulation the
    * SQL oracles use — space-joined, order-preserving).
    */
  def shingles(df: DataFrame, n: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    df.select(col(idCol), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col(idCol),
        explode(array_distinct(
          graft.functions.TextFunctions.ngrams_join(col("t"), n))).as("shingle"))
  }

  /** Exact n-gram Jaccard near-dup pairs via shingle equi-join (not a
    * cross join): |A∩B| from the join, |A|,|B| from per-doc counts,
    * threshold as an integer inequality `shared*10 >= t10*(|A|+|B|-shared)`
    * to keep the predicate float-free for oracle parity.
    */
  /** Shingle set with the document-frequency cap applied — the shared
    * front end of every shingle-pair family. df-cap: a shingle appearing
    * in f docs contributes f² join rows, so one viral boilerplate
    * shingle at 100 TB is a quadratic hot key AQE can only partially
    * split. Dropping shingles with document frequency above the cap
    * bounds the worst key at dfCap² (standard stop-shingle practice;
    * both intersections and sizes use the capped universe, so the
    * ratios stay internally consistent). Window over shingle reuses the
    * same shuffle the downstream self-join needs.
    * NOT cached: at 100 TB the exploded shingle set dwarfs the corpus —
    * pinning it in the block manager is the wrong trade (and a leak in a
    * long-lived session). A self-join's two sides are identical
    * subplans, so Spark reuses one shuffle (ReusedExchange); only the
    * narrow explode recomputes for the per-doc size aggregate.
    */
  private def cappedShingles(df: DataFrame, n: Int, dfCap: Int): DataFrame = {
    val raw = shingles(df, n)
    if (dfCap == Unbounded || dfCap <= 0) raw
    else raw.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= dfCap).drop("df")
  }

  def jaccardPairs(df: DataFrame, n: Int = 3, threshold10: Int = 4,
                   dfCap: Int = DefaultDfCap): DataFrame = {
    val sh = cappedShingles(df, n, dfCap)
    thresholdedPairs(sh, sh, threshold10, col("a.doc_id") < col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"))
  }

  /** Containment near-dup pairs (Broder '97's second resemblance
    * measure): `c(A,B) = |A∩B| / |A|` — catches a document EMBEDDED in
    * a larger one, which symmetric Jaccard dilutes below threshold
    * (|A∩B|/|A∪B| → small when |B| ≫ |A|). Emitted when either side is
    * contained: `shared·10 ≥ t10·min(|A|,|B|)` as the float-free
    * integer form; `contained` names the swallowed side. Same shingle
    * equi-join posture and dfCap rationale as [[jaccardPairs]].
    */
  def containmentPairs(df: DataFrame, n: Int = 3, threshold10: Int = 8,
                       dfCap: Int = DefaultDfCap): DataFrame = {
    val sh = cappedShingles(df, n, dfCap)
    pairCounts(sh, sh, col("a.doc_id") < col("b.doc_id"))
      .filter(col("shared") * 10 >= least(col("n_a"), col("n_b")) * threshold10)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        when(col("n_a") <= col("n_b"), col("doc_a")).otherwise(col("doc_b"))
          .as("contained"))
  }

  /** Shared Jaccard mechanics over two (doc_id, shingle) sets: per-doc
    * sizes, shared-shingle counts from the equi-join, and the float-free
    * integer threshold `shared*10 >= t10*(|A|+|B|-shared)`. The self-join
    * (jaccardPairs) and bipartite (incrementalPrune) forms differ only in
    * the extra join predicate.
    */
  /** Sizes + shingle equi-join + shared counts, predicate-free — the
    * mechanics every pair family (Jaccard, containment, bipartite)
    * filters differently. */
  private def pairCounts(shA: DataFrame, shB: DataFrame, extra: Column): DataFrame = {
    val sizesA = shA.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    val sizesB = shB.groupBy(col("doc_id")).agg(count(lit(1)).as("n_b"))
    shA.as("a").join(shB.as("b"), col("a.shingle") === col("b.shingle") && extra)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizesA.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(sizesB.withColumnRenamed("doc_id", "doc_b"), "doc_b")
  }

  private def thresholdedPairs(shA: DataFrame, shB: DataFrame,
                               threshold10: Int, extra: Column): DataFrame =
    pairCounts(shA, shB, extra)
      .filter(col("shared") * 10 >= (col("n_a") + col("n_b") - col("shared")) * threshold10)

  /** MinHash signatures: k hash functions h_i(s) = (a_i*x + b_i) mod p
    * over FNV-64a-hashed shingles (the codegen kernel; engine-neutral
    * bits, so signatures are oracle-verifiable), min per doc.
    * Computed as k aggregations over the exploded shingle set — one
    * shuffle on doc_id; signature width is a constant multiplier, not a
    * data blow-up.
    *
    * Mirrors the standard MinHash+LSH construction (Broder '97); the
    * reference has no dedup operators — this is part of the added
    * training-data-pipeline surface.
    */
  private val P = 2147483647L // 2^31-1, Mersenne prime
  private def hashFamily(k: Int): Seq[(Long, Long)] = {
    // deterministic LCG-derived coefficients; no RNG state at plan time
    (1 to k).map { i =>
      val a = (6364136223846793005L * i + 1442695040888963407L) & 0x7fffffffL
      val b = (2862933555777941757L * i + 3037000493L) & 0x7fffffffL
      (if (a == 0) 1L else a, b)
    }
  }

  def minhashSignatures(df: DataFrame, n: Int = 3, k: Int = 16): DataFrame = {
    // FNV-64a base hash (codegen kernel): engine-neutral bits, so the
    // whole signature pipeline is oracle-verifiable (a Spark-internal
    // murmur here would make the result rows-only checkable)
    val sh = shingles(df, n)
      .withColumn("h", pmod(graft.functions.FnvHash64.fnv_hash64(col("shingle")), lit(P)))
    val aggs = hashFamily(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"mh_$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Band buckets larger than this emit star edges instead of all pairs. */
  val DefaultMaxBucket = 64

  /** MinHash-LSH candidate pairs: band the signature (bands of `rows`
    * values), bucket-join on (band index, band hash). Only docs sharing
    * a band collide — the 100 TB path, no pairwise comparison.
    *
    * Hot-bucket guard: a degenerate bucket (m identical boilerplate
    * docs sharing one band key) would emit m(m-1)/2 pairs from a single
    * join task — the skew cliff at web scale. Buckets above `maxBucket`
    * therefore emit STAR edges (bucket-min doc_id → every other member,
    * m-1 edges) instead of all pairs. Star edges keep every bucket
    * member connected through the anchor, so connected components — what
    * the clustering consumers ([[clusters]], [[canonicalKeep]],
    * split-by-cluster) compute from these pairs — are unchanged; only
    * the redundant transitive pairs are dropped. The bucket-size window
    * partitions on the same (band, band_hash) key as the self-join, so
    * the exchange is reused, not added.
    */
  def minhashLshPairs(df: DataFrame, n: Int = 3, k: Int = 16, rows: Int = 4,
                      maxBucket: Int = DefaultMaxBucket): DataFrame =
    lshPairsFromSignatures(minhashSignatures(df, n, k), k, rows, maxBucket)

  /** The banding/bucket-join tail of [[minhashLshPairs]] over an
    * ALREADY-COMPUTED signature frame — consumers that need both the
    * pairs and the signatures (e.g. [[minhashJaccardEst]]) call this to
    * avoid re-running the tokenize+shingle+hash pipeline per use. */
  def lshPairsFromSignatures(sig: DataFrame, k: Int = 16, rows: Int = 4,
                             maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val nBands = k / rows
    // posexplode over an array of band keys: ONE pass over the
    // signatures instead of an nBands-way union re-scanning them. The
    // key is the joined min tuple itself (not a Spark-internal hash of
    // it) — equality semantics are identical and any engine can derive it
    val bandHashes = (0 until nBands).map { b =>
      concat_ws(",", (b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*)
    }
    val banded = sig.select(col("doc_id"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash")))
    if (maxBucket == Unbounded || maxBucket <= 0) {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    } else {
      val w = Window.partitionBy(col("band"), col("band_hash"))
      val stats = banded.select(col("doc_id"), col("band"), col("band_hash"),
        count(lit(1)).over(w).as("bc"), min(col("doc_id")).over(w).as("anchor"))
      val small = stats.filter(col("bc") <= maxBucket)
        .select(col("doc_id"), col("band"), col("band_hash"))
      val smallPairs = small.as("a").join(small.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val starPairs = stats
        .filter(col("bc") > maxBucket && col("doc_id") =!= col("anchor"))
        .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
      smallPairs.unionAll(starPairs).distinct()
    }
  }

  /** LSH banding calibration report — the number to read before
    * committing (k bands × rows) at 100 TB: candidate precision/recall
    * of [[minhashLshPairs]]' PRODUCTION candidate set (hot buckets
    * star-capped at the default `maxBucket`, exactly as the pipeline
    * runs them — pass `maxBucket = 0` downstream for the raw band
    * S-curve on a bounded sample) against the exact n-gram-Jaccard
    * truth set at `threshold10/10`. Banding with too few
    * rows floods the verifier with false candidates (precision cost =
    * wasted exact checks); too many rows drops true pairs (recall cost =
    * surviving duplicates). The report is the
    * `Pr[candidate] = 1-(1-s^rows)^bands` S-curve measured on THIS
    * corpus instead of assumed. Integer ppm; one row.
    *
    * Scale shape: both pair sets are bounded-key equi-joins; the
    * comparison is two pair-keyed joins of candidate-sized (small)
    * outputs. At 100 TB, run it on a sampled slice — the S-curve is a
    * property of the similarity distribution, not the corpus size.
    */
  def lshEval(df: DataFrame, n: Int = 3, threshold10: Int = 4,
              k: Int = 16, rows: Int = 4,
              dfCap: Int = DefaultDfCap): DataFrame = {
    val truth = jaccardPairs(df, n, threshold10, dfCap = dfCap)
      .select(col("doc_a"), col("doc_b"))
    val cand = minhashLshPairs(df, n, k, rows)
      .select(col("doc_a"), col("doc_b"))
    val hits = cand.join(truth, Seq("doc_a", "doc_b"), "leftsemi")
    val nT = truth.agg(count(lit(1)).as("n_true"))
    val nC = cand.agg(count(lit(1)).as("n_candidates"))
    val nH = hits.agg(count(lit(1)).as("n_hits"))
    nC.crossJoin(broadcast(nT)).crossJoin(broadcast(nH))
      .select(col("n_true"), col("n_candidates"), col("n_hits"),
        when(col("n_candidates") === 0, 0L)
          .otherwise(expr("n_hits * 1000000 div n_candidates")).as("precision_ppm"),
        when(col("n_true") === 0, 0L)
          .otherwise(expr("n_hits * 1000000 div n_true")).as("recall_ppm"))
  }

  /** MinHash signature-agreement Jaccard ESTIMATES vs exact Jaccard for
    * the LSH candidate pairs — the signature-level companion of
    * [[lshEval]]'s band-level calibration: `Ĵ = matches/k` is the
    * unbiased MinHash estimator (Broder '97), and this report measures
    * its realized error per candidate pair so the k (signature width)
    * trade is data-driven before 100 TB commits to it. All integer ppm.
    *
    * Scale shape: the signature joins key on the candidate pairs
    * (bounded by LSH), the exact-Jaccard shared counts come from
    * pair-scoped shingle joins — the shingle fan-out is candidate-pair
    * local, never the corpus-wide shingle self-join.
    */
  def minhashJaccardEst(df: DataFrame, n: Int = 3, k: Int = 16,
                        rows: Int = 4): DataFrame = {
    // signatures and shingles are each computed ONCE and lineage-cut:
    // pairs, the per-pair signature comparison, and the exact-Jaccard
    // tail all reuse the materialized frames instead of re-running the
    // tokenize+shingle+hash pipeline per consumer
    val sig = minhashSignatures(df, n, k).localCheckpoint(eager = false)
    val pairs = lshPairsFromSignatures(sig, k, rows)
    val sa = sig.select(col("doc_id").as("doc_a") +:
      (0 until k).map(i => col(s"mh_$i").as(s"__a_$i")): _*)
    val sb = sig.select(col("doc_id").as("doc_b") +:
      (0 until k).map(i => col(s"mh_$i").as(s"__b_$i")): _*)
    val est = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (0 until k).map(i =>
          when(col(s"__a_$i") === col(s"__b_$i"), 1L).otherwise(0L))
          .reduce(_ + _).as("sig_matches"))
    val sh = shingles(df, n).localCheckpoint(eager = false)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
    est
      .join(shared, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("sig_matches"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        col("n_a"), col("n_b"),
        expr(s"(sig_matches * 1000000) div $k").as("est_ppm"),
        expr("""(coalesce(shared, 0L) * 1000000)
               | div (n_a + n_b - coalesce(shared, 0L))""".stripMargin)
          .as("jaccard_ppm"))
  }

  /** Incremental near-dup prune: drop new-batch documents that are
    * n-gram-Jaccard near-dups of ANY document already in the historical
    * corpus — the operational form of dedup in a continuously-ingesting
    * pipeline (the batch is compared against history, never against
    * itself, and history is never rescanned for pairs). Shingle
    * equi-join batch×history (bounded keys, no cross join), integer
    * Jaccard threshold, left-anti on the hit set. Batch docs shorter
    * than n tokens have no shingles and are kept.
    */
  def incrementalPrune(batch: DataFrame, history: DataFrame, n: Int = 3,
                       threshold10: Int = 4, dfCap: Int = DefaultDfCap): DataFrame = {
    val shB0 = shingles(batch, n)
    val shH0 = shingles(history, n)
    // df-cap over the COMBINED universe: one viral boilerplate shingle in
    // f_b batch × f_h history docs is an f_b·f_h hot join key — the same
    // quadratic blowup jaccardPairs caps. The hot set (only shingles
    // above the cap) is tiny, so it prunes both sides via broadcast
    // anti-joins — no extra shuffle of either shingle set.
    val (shB, shH) =
      if (dfCap == Unbounded || dfCap <= 0) (shB0, shH0)
      else {
        val hot = shB0.select(col("shingle")).unionAll(shH0.select(col("shingle")))
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap).select(col("shingle"))
        (shB0.join(broadcast(hot), Seq("shingle"), "left_anti"),
         shH0.join(broadcast(hot), Seq("shingle"), "left_anti"))
      }
    val hits = thresholdedPairs(shB, shH, threshold10, lit(true))
      .select(col("doc_a").as("doc_id")).distinct()
    batch.join(hits, Seq("doc_id"), "left_anti")
  }

  /** SimHash (Charikar '02): 64-bit signature from per-token FNV-64a
    * bit votes (engine-neutral bits — the full signature hash-matches
    * the DuckDB twin); near-dups = small Hamming distance. Banded into 4×16-bit
    * keys for candidate generation (Hamming ≤3 ⇒ at least one band
    * equal, pigeonhole).
    */
  def simhash(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // per-token hash is FNV-64a (the codegen kernel) rather than a
    // Spark-internal hash: same bits are derivable in any engine, so the
    // full 64-bit signature is oracle-verifiable end-to-end
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", graft.functions.FnvHash64.fnv_hash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"s_$b") > 0, expr(s"CAST(1 AS BIGINT) << $b")).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    sums.select(col(idCol), sig.as("simhash"))
  }

  def simhashPairs(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(df)
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(simhash >> ${b * 16}) & 65535")): _*)).as(Seq("band", "band_bits")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_bits") === col("b.band_bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected-component clustering of the near-dup pair graph by
    * iterative min-label propagation — the correct dedup grouping (a
    * keep-lowest policy over components, not just pair right-sides).
    *
    * Each iteration is one join + min-aggregate (both shuffle on doc id
    * and scale linearly); iteration count = component diameter, which is
    * tiny for near-dup clusters. The driver loop materializes per round
    * (standard Spark iterative-graph shape; large-star/small-star is the
    * same idea with better skew bounds at web scale).
    */
  /** ADAPTIVE strategy (the default entry point): min-label propagation
    * — one join + min-aggregate per round, optimal for the tiny
    * diameters of real near-dup clusters — with an automatic
    * large-star/small-star fallback once `probeRounds` rounds have not
    * converged. Round count IS the diameter probe: near-dup graphs
    * finish in 2–4 rounds, so a graph still moving after `probeRounds`
    * is adversarial (long paths/chains from e.g. templated boilerplate)
    * and [[clustersStar]] finishes it in O(log n) rounds total instead
    * of O(diameter). Both strategies share the output contract, so the
    * switch never changes the answer — only the round bound.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 20,
               probeRounds: Int = 5): DataFrame =
    clustersAdaptiveWithInfo(pairs, maxIter, probeRounds)._1

  /** (labels, fellBackToStar, roundsUsed) — instrumented form for specs
    * and capacity planning. */
  private[graft] def clustersAdaptiveWithInfo(pairs: DataFrame, maxIter: Int = 20,
      probeRounds: Int = 5): (DataFrame, Boolean, Int) = {
    // localCheckpoint (eager) both materializes for reuse AND truncates
    // lineage so round N's plan doesn't replay rounds 1..N-1
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct().localCheckpoint(true)
    // convergence = stable order-independent checksum of the assignment,
    // read as an observe() metric DURING the per-round checkpoint
    // materialization — the eager checkpoint already runs a job over
    // exactly these rows, so the old separate checksum scan (one extra
    // driver round-trip per round; these loops are driver-latency-bound
    // at small SF) is free. coalesce: bit_xor over ZERO rows is NULL —
    // an empty pair graph (clean corpus) must yield zero clusters.
    val cksumCol = coalesce(expr("bit_xor(xxhash64(doc, label))"), lit(0L))
    def pinWithChecksum(df: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val pinned = df.observe(obs, cksumCol.as("cksum")).localCheckpoint(true)
      // the eager checkpoint has completed here, so the observed metric
      // should already be posted — the BOUNDED wait on the public
      // `future` guards the (undocumented) withAction routing the
      // fusion relies on: if a runtime ever stops posting metrics for
      // checkpoint actions this degrades to one explicit checksum scan
      // of the pinned rows instead of a silent driver hang (r16 advice)
      val sum = try
        scala.concurrent.Await
          .result(obs.future, scala.concurrent.duration.Duration(30, "s"))
          .getAs[Long]("cksum")
      catch {
        case _: java.util.concurrent.TimeoutException =>
          pinned.agg(cksumCol.as("cksum")).head.getLong(0)
      }
      (pinned, sum)
    }
    var (labels, prev) = pinWithChecksum(
      edges.select(col("a").as("doc")).distinct().withColumn("label", col("doc")))
    var iter = 0
    var converged = false
    // one propagation hop: every node takes the min of its own label and
    // its neighbors' labels (min is monotone, so hops compose freely)
    def hop(l: DataFrame): DataFrame =
      l.unionByName(edges.join(l, edges("b") === l("doc"))
          .select(edges("a").as("doc"), l("label")))
        .groupBy(col("doc")).agg(min(col("label")).as("label"))
    // DOUBLE-STEP rounds (guide §2.4/§2.6): these loops are bound by
    // driver round-trips (pin job + AQE stage jobs per round), not data,
    // so each materialized round advances TWO hops — half the pins and
    // checksum reads for the same fixpoint. The fixpoint is unchanged
    // (stable under two monotone hops ⇔ stable under one), and so is the
    // output contract; only the job count per run drops.
    val probeBound =
      math.max(1, math.min((math.max(probeRounds, 1) + 1) / 2, maxIter))
    while (!converged && iter < probeBound) {
      val (next, sum) = pinWithChecksum(hop(hop(labels)))
      labels = next
      converged = sum == prev // min-propagation is monotone: stable ⇒ done
      prev = sum
      iter += 1
    }
    if (converged)
      (labels.select(col("doc").as("doc_id"), col("label").as("cluster_id")),
        false, iter)
    else {
      // still moving after the probe: adversarial diameter — restart on
      // the star algorithm (probe work is a bounded constant, and star
      // rounds are logarithmic from ANY starting edge set)
      val (starLabels, starRounds) = clustersStarWithRounds(pairs, maxIter)
      (starLabels, true, iter + starRounds)
    }
  }

  /** Connected components over `pairs` QUOTIENTED by a precomputed
    * partition: `anchors` (doc_id → anchor, anchor = the group's MIN
    * member id, every doc covered) contracts each group to its anchor,
    * the iterative labeling ([[clusters]]) runs on the quotient graph
    * only, and labels expand back to members. Contracting connected
    * vertex subsets preserves components exactly, so the output equals
    * `clusters(pairs ∪ anchor-group star edges)` — the joint URL+content
    * dedup shape (RefinedWeb §3.3's two passes as one component
    * computation) — while the anchor stars never enter the loop and the
    * quotient's node count and diameter are ≤ the joint graph's. At
    * 100 TB this is the difference between iterating over every URL
    * duplicate (the majority class in web crawls) and iterating over
    * one representative per URL group; the two mapping joins are plain
    * equi-joins on doc_id, and singleton groups ride the coalesce
    * (anchors without any quotient edge keep themselves) rather than
    * inflating the edge set.
    *
    * Output contract matches [[clusters]] over the joint graph exactly:
    * only docs that PARTICIPATE in a duplicate relation (member of a
    * multi-doc anchor group, or endpoint of a pair) are labeled —
    * untouched singletons don't appear, same as a vertex with no edges.
    */
  def clustersContracted(pairs0: DataFrame, anchors0: DataFrame,
                         maxIter: Int = 20): DataFrame = {
    require(Seq("doc_id", "anchor").forall(anchors0.columns.contains),
      s"clustersContracted: anchors needs (doc_id, anchor), got ${anchors0.columns.toSeq}")
    // BOTH inputs are multi-consumer here (pairs: quotient + pairDocs;
    // anchors: quotient + multiGroups + vertices + the final join), and
    // each typically sits on an expensive pipeline (MinHash banding, a
    // URL-group aggregation). Unpinned, the whole pair pipeline re-ran
    // inside the final assembly job — profiled at sf0.1 as ~half of
    // web_joint_dedup's task time (guide §1.2: don't recompute what you
    // already computed; §5: pairs is duplicate-sized, anchors two longs
    // per doc — both are the cheap side of their producing pipelines).
    // the two pins are independent jobs — overlap them on two driver
    // threads (§2.6) so the URL-group build back-fills the MinHash
    // build's straggler tail instead of waiting for it
    val (pairs, anchors) = DriverJobs.par2(
      pairs0.select(col("doc_a"), col("doc_b")).localCheckpoint(true),
      anchors0.select(col("doc_id"), col("anchor")).localCheckpoint(true))
    val quotient = pairs
      .join(anchors.select(col("doc_id").as("doc_a"), col("anchor").as("__aa")), "doc_a")
      .join(anchors.select(col("doc_id").as("doc_b"), col("anchor").as("__ab")), "doc_b")
      .select(col("__aa").as("doc_a"), col("__ab").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val anchorLabels = clusters(quotient, maxIter)
      .select(col("doc_id").as("anchor"), col("cluster_id"))
    // the joint graph's vertex set: members of multi-doc groups (the
    // star edges' endpoints) ∪ pair endpoints — both frames are
    // duplicate-count-sized aggregates, joined back on doc_id/anchor
    val multiGroups = anchors.groupBy(col("anchor"))
      .agg(count(lit(1)).as("__gn")).filter(col("__gn") > 1).select(col("anchor"))
    val pairDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val vertices = anchors.join(multiGroups, Seq("anchor"), "left_semi")
      .select(col("doc_id"))
      .unionByName(pairDocs).distinct()
    anchors.join(vertices, Seq("doc_id"), "left_semi")
      .join(anchorLabels, Seq("anchor"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("anchor")).as("cluster_id"))
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log n) rounds on ANY graph — including
    * long paths and other adversarial diameters where plain min-label
    * propagation needs diameter-many rounds. Each half-round is one
    * groupBy + join on node id (linear shuffles, no skew beyond the
    * star centers, which the algorithm itself flattens).
    *
    *   large-star(u): connect every strictly-larger neighbor v > u to
    *     m = min(Γ(u) ∪ {u});
    *   small-star(u): connect every strictly-smaller neighbor (and u)
    *     to m = min(Γ⁻(u) ∪ {u}).
    *
    * At fixpoint every component is a star centered at its minimum, so
    * labels read off as min(neighbor, self) — identical output contract
    * to [[clusters]] (the diameter-bounded near-dup default).
    */
  def clustersStar(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    clustersStarWithRounds(pairs, maxIter)._1

  private[graft] def clustersStarWithRounds(pairs: DataFrame,
                                            maxIter: Int = 30): (DataFrame, Int) = {
    def bidir(e: DataFrame) =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    // same fused checkpoint+checksum as the adaptive loop: the edge-set
    // checksum rides the eager checkpoint's own job as an observe metric
    val eksumCol = coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))
    def pinEdges(df: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val pinned = df.observe(obs, eksumCol.as("cksum")).localCheckpoint(true)
      // bounded metric read + explicit-scan fallback — same guard as
      // the adaptive loop's pinWithChecksum (r16 advice)
      val sum = try
        scala.concurrent.Await
          .result(obs.future, scala.concurrent.duration.Duration(30, "s"))
          .getAs[Long]("cksum")
      catch {
        case _: java.util.concurrent.TimeoutException =>
          pinned.agg(eksumCol.as("cksum")).head.getLong(0)
      }
      (pinned, sum)
    }
    var (edges, prev) = pinEdges(pairs
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var rounds = 0
    var converged = prev == 0L && edges.isEmpty
    while (!converged && rounds < maxIter) {
      // large-star: (m, v) for v > u, m = min(Γ(u) ∪ {u})
      val nbr = bidir(edges)
      val lmins = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = nbr.join(lmins, "u").filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
      // small-star over strictly-smaller neighborhoods: (m, v) for
      // v ∈ Γ⁻(u) \ {m}, plus (m, u)
      val snbr = bidir(afterLarge).filter(col("v") < col("u"))
      val smins = snbr.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = snbr.join(smins, "u")
        .select(col("m").as("u"), col("v"))
        .filter(col("u") =!= col("v"))
        .unionByName(smins.select(col("m").as("u"), col("u").as("v")))
      val (next, sum) = pinEdges(small
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .distinct())
      edges = next
      converged = sum == prev // star fixpoint ⇒ edge set stable
      prev = sum
      rounds += 1
    }
    val connected = bidir(edges).groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("doc_id"), least(col("mn"), col("u")).as("cluster_id"))
    // nodes appearing only in self-pairs (doc_a == doc_b) have no edges
    // after the u =!= v filter but must still label as their own
    // singleton — the output contract shared with [[clusters]]
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val labels = nodes.join(connected, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Canonical selection — the step AFTER near-dup detection that a
    * real pipeline actually ships: cluster the duplicate pairs
    * ([[clusters]]), then per cluster KEEP exactly one member — the
    * highest-`scoreCol` doc (ties to the lowest id) — and mark the rest
    * as drops. Docs in no pair are their own singleton cluster and
    * always keep. Output: every corpus doc with its `cluster_id`, the
    * ranking score, and the `keep` verdict; `filter(keep)` IS the
    * deduplicated corpus.
    *
    * Scale shape: the label propagation is [[clusters]]' (adaptive,
    * log-round fallback); the selection itself adds ONE window shuffle
    * keyed by cluster_id, whose partitions are duplicate-cluster-sized
    * — bounded by the biggest near-dup family, not the corpus.
    */
  def canonicalKeep(df: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id",
                    scoreCol: String = "n_chars"): DataFrame = {
    val labels = clusters(pairs)
      .withColumnRenamed("doc_id", idCol)
    val joined = df.select(col(idCol), col(scoreCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), col(scoreCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol))
    joined
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col(scoreCol), col("keep"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every token `k`-gram, slide a window of
    * `w` consecutive hashes, keep the MINIMUM of each full window; the
    * distinct kept hashes are the document's fingerprint set. The
    * published guarantee: any match of length ≥ k + w − 1 tokens shares
    * at least one fingerprint, while only ~2/(w+1) of positions are
    * kept — a tunable density/recall trade the flat shingle family
    * doesn't offer. Hashes are FNV-64a (the codegen kernel), so the
    * whole set is oracle-verifiable.
    *
    * Scale shape: one (doc, pos) window pass — the min and the
    * full-window count ride the SAME window partition (one shuffle on
    * doc id), then a distinct. Candidate pairs are then an equi-join on
    * the fingerprint hash: [[thresholdedPairs]] posture, never
    * all-pairs.
    */
  def winnowingFingerprints(df: DataFrame, k: Int = 5, w: Int = 4,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && w > 0, s"winnowing: k=$k w=$w must be positive")
    val grams = df
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.ngrams_join(col("t"), k))
          .as(Seq("pos", "gram")))
      .withColumn("h", graft.functions.FnvHash64.fnv_hash64(col("gram")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      .withColumn("n_in_win", count(lit(1)).over(win))
      .filter(col("n_in_win") === w) // full windows only
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints with a
    * shared-count floor — the join-side consumer of
    * [[winnowingFingerprints]]. */
  def winnowingPairs(df: DataFrame, k: Int = 5, w: Int = 4,
                     minShared: Int = 2, dfCap: Int = DefaultDfCap): DataFrame = {
    // same df-cap default as the shingle family: a fingerprint shared by
    // f docs fans out to f² join rows through one key, so boilerplate
    // fingerprints above the cap are excised (Dedup.Unbounded opts out)
    val fp0 = winnowingFingerprints(df, k, w)
    val fp =
      if (dfCap == Unbounded || dfCap <= 0) fp0
      else fp0.withColumn("dfc",
          count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("dfc") <= dfCap).drop("dfc")
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Keep-lowest prune over the winnowing pair graph — completes the
    * winnowing family the way `dedup_prune` completes the Jaccard one:
    * drop every doc appearing as the right side of a qualifying pair.
    */
  def winnowingPrune(df: DataFrame, k: Int = 5, w: Int = 4,
                     minShared: Int = 2): DataFrame = {
    val drops = winnowingPairs(df, k, w, minShared)
      .select(col("doc_b").as("doc_id")).distinct()
    df.join(drops, Seq("doc_id"), "left_anti")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    * pairs via CLUSTER-SCOPED cosine comparison — embeddings are first
    * assigned to a coarse quantizer (the shuffle-free broadcast-argmax
    * shape shared with IVF; centroids are the same documented
    * deterministic k-means stand-in), and pairwise cosine is computed
    * only WITHIN a cluster. That is the paper's whole scaling argument:
    * all-pairs over n vectors is O(n²), but within k balanced clusters
    * it is O(n²/k) — and in Spark terms the pair generation becomes an
    * equi-join on `centroid_id` (bounded keys, same posture as the
    * shingle/LSH families), never a cross join. A cluster holding f
    * vectors contributes f² candidate rows, so k trades recall
    * (cross-cluster dups are missed — the paper accepts this) against
    * the hot-key bound, exactly like `jaccardPairs`' dfCap.
    *
    * Output: one row per same-cluster pair with cosine ≥ `threshold`,
    * plus each side's similarity to the shared centroid (the paper's
    * ranking signal — see [[semanticPrune]]).
    */
  /** The SemDeDup quantizer: FITTED exact-mean kmeans by default (the
    * paper clusters with k-means; seed centroids skew cluster sizes on
    * real data and every within-cluster f² pair join inherits it),
    * lowest-id seed at `kmeansIters <= 0` for the SQL-trivial baseline. */
  private def semanticQuantizer(source: DataFrame, nClusters: Int,
                                kmeansIters: Int): DataFrame =
    if (kmeansIters <= 0)
      source.orderBy(col("vec_id")).limit(nClusters)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    else Similarity.kmeansCentroids(source, nClusters, kmeansIters)

  def semanticDupPairs(emb: DataFrame, nClusters: Int = 16,
                       threshold: Double = 0.99, kmeansIters: Int = 2,
                       balanceFactor: Double = 4.0): DataFrame = {
    val centroids = semanticQuantizer(emb, nClusters, kmeansIters)
    val assigned0 = Similarity.ivfAssignWithSim(emb, centroids)
      .withColumn("norm", Similarity.l2Norm("embedding"))
    // with the guard active the assignment is consumed THREE times
    // (eager sizing + both self-join sides) — pin it once instead of
    // recomputing the corpus-wide argmax scan per consumer
    val assigned = if (balanceFactor > 0) assigned0.localCheckpoint(true) else assigned0
    // CLUSTER BALANCE GUARD: a cluster of f vectors contributes f² pair
    // rows through ONE join key — at 100 TB a single skewed cluster
    // serializes into one task. Oversized clusters (> balanceFactor×n/k
    // members, exact sizes from one narrow count pass — the documented-
    // eager bloom-sizing stance) are 2-D BLOCK-DECOMPOSED: members hash
    // into S = ceil(f/cap) blocks, and the join key becomes the ORDERED
    // block pair (own block, partner block): the lower-id side carries
    // (blk, j) for every partner block j, the higher-id side (i, blk)
    // for every i — a pair with blocks (p, q) meets at EXACTLY the key
    // (p, q), whichever side hashed higher (strict a<b fixes the roles,
    // so no diagonal echo). Output is IDENTICAL to the plain join
    // (oracles unaffected) while the hottest key shrinks from f² to
    // (f/S)². Replication is S copies per row, hot clusters only;
    // balanced data takes the plain join untouched.
    val salts = Similarity.listSaltCounts(
      assigned.select(col("centroid_id")), nClusters, balanceFactor)
    val (aSide, bSide, joinKey) =
      if (salts.isEmpty)
        (assigned, assigned,
          col("a.centroid_id") === col("b.centroid_id") &&
            col("a.vec_id") < col("b.vec_id"))
      else {
        val nBlk = coalesce(element_at(typedLit(salts), col("centroid_id")), lit(1))
          .cast("long")
        val blk = pmod(xxhash64(col("vec_id")), nBlk)
        val left = assigned
          .withColumn("__bi", blk)
          .withColumn("__bj", explode(sequence(lit(0L), nBlk - lit(1L))))
        val right = assigned
          .withColumn("__bi", explode(sequence(lit(0L), nBlk - lit(1L))))
          .withColumn("__bj", blk)
        (left, right,
          col("a.centroid_id") === col("b.centroid_id") &&
            col("a.__bi") === col("b.__bi") && col("a.__bj") === col("b.__bj") &&
            col("a.vec_id") < col("b.vec_id"))
      }
    aSide.as("a").join(bSide.as("b"), joinKey)
      .select(col("a.centroid_id").as("cluster_id"),
        col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.dot("a.embedding", "b.embedding") /
          (col("a.norm") * col("b.norm"))).as("cosine"),
        col("a.centroid_sim").as("centroid_sim_a"),
        col("b.centroid_sim").as("centroid_sim_b"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup pruning: within each semantic-dup relation KEEP the
    * example with the LOWER similarity to its cluster centroid — the
    * paper keeps low-centroid-similarity representatives because they
    * are the more diverse ones (§3: "we keep the examples with the
    * lowest cosine similarity to the cluster centroid"). The paper's
    * per-cluster greedy sweep is sequential; this is the standard
    * parallel relaxation (the same one `dedup_prune` applies to exact
    * dups): drop v iff some dup-neighbor u beats it — centroid_sim_u <
    * centroid_sim_v, ties toward the lower vec_id. One aggregation over
    * the pair set, one anti-join; nothing rescans the corpus.
    */
  def semanticPrune(emb: DataFrame, nClusters: Int = 16,
                    threshold: Double = 0.99, kmeansIters: Int = 2): DataFrame = {
    // pairs guarantee id_a < id_b, so the tie-break (lower id wins)
    // reduces to: a drops only on a STRICT centroid-sim loss, b drops on
    // loss OR tie — the same two live branches the SQL oracle spells out
    val pairs = semanticDupPairs(emb, nClusters, threshold, kmeansIters)
    val dropA = pairs.filter(col("centroid_sim_b") < col("centroid_sim_a"))
      .select(col("id_a").as("vec_id"))
    val dropB = pairs.filter(col("centroid_sim_a") <= col("centroid_sim_b"))
      .select(col("id_b").as("vec_id"))
    emb.join(dropA.unionByName(dropB).distinct(), Seq("vec_id"), "left_anti")
  }

  /** Continuous-ingest SemDeDup: drop BATCH vectors that are
    * semantically too close to any HISTORY vector — the incremental
    * form of [[semanticDupPairs]] (the same relationship
    * [[incrementalPrune]] has to [[jaccardPairs]]). Both sides are
    * assigned to the HISTORY's coarse quantizer (the batch must be
    * binned by the same centroids or same-cluster comparison is
    * meaningless), then batch×history cosine is computed only within a
    * cluster — an equi-join on `centroid_id`, never batch×history
    * all-pairs. The batch is never compared against itself.
    *
    * The batch side may be STREAMING: centroids come from the static
    * history (eagerly bounded: lowest-id k, the documented k-means
    * stand-in), and the membership test is a broadcast LEFT join to
    * per-centroid history member arrays plus an `exists` projection —
    * no anti-join anywhere (a "does any member qualify" anti-join
    * derived from the stream would put the stream on the right side,
    * which Structured Streaming rejects). Per-cluster member arrays are
    * corpus/k vectors each — bounded by growing k with the corpus, the
    * same stance as [[semanticDupPairs]].
    */
  /** Broadcast budget: the per-cluster member arrays hold the ENTIRE
    * history (÷k per cluster), so the broadcast grows linearly with
    * history size. Past `maxBroadcastBytes` the broadcast path would
    * OOM executors at 10⁹-vector history — a streaming caller fails
    * LOUDLY (grow nClusters, shrink history, or raise the cap), and a
    * batch caller falls back to a shuffled within-cluster equi-join
    * (identical output, proven by DedupSpec; both sides shuffle on
    * centroid_id instead of pinning history in every executor).
    *
    * History size is measured exactly (one narrow count/sum pass over
    * the history — eager, the documented bloom-sizing stance; it only
    * touches the STATIC side, so the streaming form stays legal).
    *
    * Durability note: the quantizer/member tables are pinned with
    * `localCheckpoint(true)`, which lives on executor storage — an
    * executor loss in a long-lived streaming query fails the query
    * rather than recomputing. Fine for AvailableNow/batch triggers; a
    * long-running stream should persist the fitted quantizer to a table
    * and pass a pre-assigned history instead.
    */
  def semanticPruneIncremental(batch: DataFrame, history: DataFrame,
                               nClusters: Int = 16,
                               threshold: Double = 0.99,
                               kmeansIters: Int = 2,
                               maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    val centroids = semanticQuantizer(history, nClusters, kmeansIters)
      .localCheckpoint(true) // materialize once: a streaming join must not
                             // re-derive the quantizer every trigger
    val assignedH = Similarity.ivfAssignWith(history, centroids)
      .withColumn("hnorm", Similarity.l2Norm("embedding"))
    // ~bytes of the broadcast member arrays: 4 B per float component +
    // ~24 B per member row (id + norm + struct overhead)
    val stats = history
      .agg(count(lit(1)).as("n"), sum(size(col("embedding"))).as("comps")).head
    val estBytes = stats.getLong(0) * 24L +
      (if (stats.isNullAt(1)) 0L else stats.getLong(1) * 4L)
    if (estBytes > maxBroadcastBytes) {
      require(!batch.isStreaming,
        s"semanticPruneIncremental: history member broadcast ~$estBytes B exceeds " +
          s"maxBroadcastBytes=$maxBroadcastBytes and the shuffled fallback cannot " +
          s"run with a streaming batch side (stream-on-right anti-join). Grow " +
          s"nClusters with the corpus, prune history, or raise the cap.")
      val ba = Similarity.ivfAssignKeepAll(batch, centroids)
        .withColumn("bnorm", Similarity.l2Norm("embedding"))
      val hits = ba.join(assignedH
          .select(col("centroid_id"), col("vec_id").as("hist_id"),
            col("embedding").as("he"), col("hnorm")), Seq("centroid_id"))
        .filter(col("hist_id") =!= col("vec_id") &&
          (graft.functions.VecFunctions.vec_dot(col("embedding"), col("he")) /
            (col("bnorm") * col("hnorm"))) >= threshold)
        .select(col("vec_id")).distinct()
      batch.join(hits, Seq("vec_id"), "left_anti")
    } else {
      val members = assignedH
        .groupBy(col("centroid_id"))
        .agg(collect_list(struct(col("vec_id").as("hist_id"),
          col("embedding").as("he"), col("hnorm"))).as("members"))
        .localCheckpoint(true)
      val b = Similarity.ivfAssignKeepAll(batch, centroids)
        .withColumn("bnorm", Similarity.l2Norm("embedding"))
      // LEFT join: a batch row binned to a cluster no history vector
      // landed in has nothing to collide with and must SURVIVE
      b.join(broadcast(members), Seq("centroid_id"), "left")
        .filter(col("members").isNull || !exists(col("members"), m =>
          m.getField("hist_id") =!= col("vec_id") &&
            (graft.functions.VecFunctions.vec_dot(col("embedding"), m.getField("he")) /
              (col("bnorm") * m.getField("hnorm"))) >= threshold))
        .select(batch.columns.map(col).toSeq: _*)
    }
  }

  /** Bloom-prefiltered incremental exact dedup: drop new-batch documents
    * whose content already exists in the historical corpus, WITHOUT
    * shuffling either side against the other. A Bloom filter over the
    * history's content hashes (built with `bloom_filter_agg` — partial
    * sketches merged treewise, one compact binary on the driver) is
    * broadcast as a plan-time literal; the batch probes it with the
    * codegen `BloomFilterMightContain` kernel. Bloom "no" answers are
    * definitive (no false negatives), so only the tiny bloom-positive
    * slice — true dups plus ~fpp of the batch — reaches the confirming
    * anti-join against the history hash set. Exactness never depends on
    * fpp; fpp only sizes the confirm join.
    *
    * 100 TB sizing: ~9.6 bits/key at 1 % fpp → 120 MB per 10⁸ history
    * docs, 1.2 GB per 10⁹ — the broadcast form holds to ~10⁹ keys;
    * beyond that raise fpp (0.1 → ~0.6 GB per 10⁹; the confirm join
    * still restores exactness) or set `shards > 1`: N independent
    * hash-range filters built in one grouped pass, each row probing
    * exactly one (fpp is per-key invariant under sharding — a key is
    * tested against the one filter holding its range).
    * Equality is 64-bit content-hash equality (same posture as
    * [[exact]]'s md5 keys — a 2⁻⁶⁴ collision deletes a unique doc).
    *
    * `batch` may be a STREAMING DataFrame: the eager actions here touch
    * only the static history, and the batch-side plan is filter +
    * stream-static left-anti + union — all streaming-legal, so the
    * continuous-ingest form is this same code path (StreamingSpec
    * proves stream ≡ batch).
    *
    * Duplicate-detection contract: LEFT-ANTI equality on non-null
    * content — a NULL-text batch row is never anyone's duplicate and
    * always survives (SQL `NOT IN` would instead nuke every row when
    * history contains a NULL; the anti-join semantics are the ones a
    * pipeline wants). `expectedItems > 0` skips the sizing count — the
    * count is otherwise one full scan of the history (NOT metadata-only:
    * any filter on the history forces a data read), so a caller that
    * knows the corpus size should say so.
    */
  def bloomPrune(batch: DataFrame, history: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id",
                 fpp: Double = 0.01, expectedItems: Long = 0L,
                 shards: Int = 1): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    require(shards >= 1, s"bloomPrune: shards=$shards must be >= 1")
    val hHist = history.filter(col(textCol).isNotNull)
      .select(xxhash64(col(textCol)).as("h"))
    // EMPTY history → nothing to dedup against: pass the batch through
    // (the sketch builder NPEs on zero rows, and a degenerate filter
    // must never swallow the batch). The sizing count doubles as the
    // emptiness probe; a caller-supplied size still gets a cheap
    // limit-1 existence check.
    val counted = if (expectedItems > 0) -1L else hHist.count()
    if (counted == 0L || (expectedItems > 0 && hHist.isEmpty)) return batch
    val n = math.max(if (expectedItems > 0) expectedItems else counted, 1L)
    // one predicate per shard, each guarded by its hash-range test and
    // carrying its own constant bloom literal (BloomFilterMightContain
    // deserializes a foldable bloom ONCE; a per-row array lookup would
    // re-deserialize per row). Conjunction short-circuits in codegen, so
    // each row probes exactly one filter.
    def mightAny(c: Column, filters: Seq[(Long, Array[Byte])]): Column =
      filters.map { case (s, bytes) =>
        (if (shards == 1) lit(true) else pmod(c, lit(shards.toLong)) === lit(s)) &&
          ColumnBridge.column(BloomFilterMightContain(
            Literal.create(bytes, BinaryType), ColumnBridge.expression(c)))
      }.reduceOption(_ || _).getOrElse(lit(false))
    val filters: Seq[(Long, Array[Byte])] =
      if (shards == 1) {
        // the public sketch API builds the filter directly (distributed
        // treewise merge) — no session conf is read OR mutated, so
        // concurrent queries can never race on shared clamp settings
        val bf = hHist.stat.bloomFilter("h", n, fpp)
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        Seq(0L -> out.toByteArray)
      } else {
        // HASH-RANGE SHARDING — the beyond-10⁹-keys path: N independent
        // filters keyed by pmod(h, N), ALL built in one pass (groupBy
        // shard + partial-agg'd bloom aggregate; the internal node is
        // the only grouped bloom builder). Each shard holds ~n/N keys,
        // so per-shard sizing must fit inside the runtime-filter clamps
        // — enforced loudly instead of mutating session confs (the old
        // form raced concurrent queries on the shared clamp settings).
        val perShard = math.max(n / shards + 3 * math.max(1L,
          (math.sqrt(n.toDouble / shards)).toLong), 1L) // mean + 3σ slack
        val perBits = math.max(64L,
          math.ceil(-perShard * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
        val sess = history.sparkSession
        val maxItems = sess.conf
          .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
        val maxBits = sess.conf
          .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
        require(perShard <= maxItems && perBits <= maxBits,
          s"bloomPrune: per-shard sketch ($perShard items / $perBits bits at " +
            s"fpp=$fpp) exceeds the runtime bloom clamps ($maxItems items / " +
            s"$maxBits bits) — raise `shards`, raise `fpp`, or raise the " +
            "spark.sql.optimizer.runtime.bloomFilter.* limits up front")
        hHist.groupBy(pmod(col("h"), lit(shards.toLong)).as("shard"))
          .agg(ColumnBridge.column(
            new BloomFilterAggregate(ColumnBridge.expression(col("h")),
              Literal(perShard), Literal(perBits)).toAggregateExpression()).as("bf"))
          .collect().toSeq
          .filter(!_.isNullAt(1))
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      }
    // EMPTY history → no usable filter; nothing to dedup against, so the
    // batch passes through unchanged (a null/empty bloom must never
    // swallow the batch).
    if (filters.isEmpty || filters.forall(_._2 == null)) return batch
    val live = filters.filter(_._2 != null)
    val withH = batch.withColumn("__h",
      when(col(textCol).isNull, lit(null)).otherwise(xxhash64(col(textCol))))
    // NULL text: __h is null, both might() branches are null — route
    // nulls explicitly into the survivor branch
    val definitelyNew = withH.filter(col("__h").isNull || !mightAny(col("__h"), live))
    val suspected = withH.filter(col("__h").isNotNull && mightAny(col("__h"), live))
      .join(hHist.distinct().withColumnRenamed("h", "__h"), Seq("__h"), "left_anti")
    definitelyNew.unionByName(suspected).drop("__h")
  }

  /** Threshold-sweep dedup report: how many near-dup PAIRS and how many
    * would-be-dropped DOCS each candidate cosine threshold yields — the
    * chart a pipeline owner reads before committing to a SemDeDup
    * threshold (the paper tunes τ per corpus; sweeping by rerunning the
    * whole dedup per τ is the naive 100 TB mistake). ONE pass over the
    * pair set: each pair lands in its cosine bucket, and cumulative
    * counts from the top give every threshold's answer simultaneously.
    * `docs_dropped_at_or_above` uses [[semanticPrune]]'s OWN drop
    * policy (each pair's LOSER is the higher-centroid-sim side, ties
    * toward the higher id) so the chart predicts exactly what the
    * committed prune would remove: a doc drops at threshold t iff the
    * MAX cosine over its losing pairs is ≥ t, so each doc contributes
    * once, at its max losing bucket, and the same top-down cumulative
    * sum answers every t. The narrow (bucket, loser) projection is
    * pinned with `localCheckpoint` — two aggregations consume it and
    * the within-cluster pair join must not run twice.
    */
  def semanticThresholdSweep(emb: DataFrame, nClusters: Int = 16,
                             tauFloor: Double = 0.2, step: Double = 0.05,
                             kmeansIters: Int = 2): DataFrame = {
    val pairs = semanticDupPairs(emb, nClusters, threshold = tauFloor, kmeansIters)
    // integer bucket index: floor((cosine - tauFloor)/step), clamped up
    // at the last bucket; buckets are [tauFloor + i·step, + (i+1)·step)
    val nB = math.max(math.ceil((1.0 - tauFloor) / step).toInt, 1)
    val bucket = least(floor(((col("cosine") - lit(tauFloor)) / lit(step))).cast("int"),
      lit(nB - 1))
    // pairs guarantee id_a < id_b, so semanticPrune's tie-break (lower
    // id wins) makes a the loser only on a STRICT centroid-sim loss —
    // the same two branches as semanticPrune's dropA/dropB
    val loser = when(col("centroid_sim_b") < col("centroid_sim_a"), col("id_a"))
      .otherwise(col("id_b"))
    val byBucket = pairs.select(bucket.as("b"), loser.as("loser"))
      .localCheckpoint(true)
    val pairCounts = byBucket.groupBy(col("b")).agg(count(lit(1)).as("n_pairs"))
    // a doc drops at threshold t iff it LOSES some pair with
    // cosine >= t ⇒ its contribution starts at its MAX losing bucket
    val docMax = byBucket.groupBy(col("loser")).agg(max(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_new_drops"))
    val w = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairCounts.join(docMax, Seq("b"), "full")
      .select(col("b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_new_drops"), lit(0L)).as("n_new_drops"))
      .withColumn("pairs_at_or_above", sum(col("n_pairs")).over(w))
      .withColumn("docs_dropped_at_or_above", sum(col("n_new_drops")).over(w))
      .withColumn("threshold_milli",
        (lit(math.round(tauFloor * 1000)) + col("b") * lit(math.round(step * 1000))))
      .select(col("threshold_milli"), col("n_pairs"), col("pairs_at_or_above"),
        col("docs_dropped_at_or_above"))
  }

  /** Edit-distance near-dup pairs for SHORT strings (titles, names,
    * URLs — the fuzzy-matching half of entity dedup): exact
    * `levenshtein(a, b) ≤ k` verification over PIGEONHOLE-blocked
    * candidates. Each string of length L is cut into k+1 contiguous
    * segments (even split, remainder spread left); by pigeonhole, two
    * SAME-LENGTH strings within k substitutions share at least one
    * aligned segment, so the equi-join on (segment index, segment
    * text, length) is recall-complete for substitution distance.
    * Indel-shifted pairs can escape the blocking (the full PassJoin
    * shift-window is the published fix) — a documented recall trade,
    * exactly like MinHash banding; every SURVIVING pair is exact.
    *
    * Strings SHORTER than k+1 get a single whole-length block instead
    * of segments: with L ≤ k every same-length pair is within k
    * substitutions by definition, so same-length all-pairs IS the
    * complete candidate set there (still levenshtein-verified, still
    * df-cappable).
    *
    * Scale shape: k+1 narrow segment rows per string, one equi-join on
    * a bounded key, distinct pair set, then the levenshtein verify runs
    * only on candidates — never all-pairs. Segment hot keys mirror the
    * shingle family's df posture: a segment shared by many strings
    * fans out quadratically; `dfCap` (default on) excises segments
    * above it, trading recall on boilerplate-heavy blocks for a
    * bounded largest task.
    */
  def editDistancePairs(df: DataFrame, k: Int = 2, textCol: String = "text",
                        idCol: String = "doc_id",
                        dfCap: Int = EditDistanceDfCap): DataFrame = {
    require(k >= 1, s"editDistancePairs: k=$k must be >= 1")
    val segs = editSegments(df, k, textCol, idCol)
    val capped =
      if (dfCap <= 0) segs
      else {
        // the cap trades recall on boilerplate-heavy blocks for a
        // bounded largest task — make the loss OBSERVABLE rather than
        // silent: the excised-block census rides the plan as named
        // observe() metrics (n_excised_blocks / n_excised_rows land in
        // every QueryExecutionListener / StreamingQueryProgress with
        // zero extra jobs), and [[editDistanceExcisedBlocks]] is the
        // standalone audit of WHICH blocks were cut
        val hot = segs.groupBy(col("seg_i"), col("seg"), col("L"))
          .agg(count(lit(1)).as("__df")).filter(col("__df") > dfCap)
          .observe("dedup_edit_excised",
            count(lit(1)).as("n_excised_blocks"),
            coalesce(sum(col("__df")), lit(0L)).as("n_excised_rows"))
          .select(col("seg_i"), col("seg"), col("L"))
        segs.join(hot, Seq("seg_i", "seg", "L"), "left_anti")
      }
    capped.as("a").join(capped.as("b"),
        col("a.seg_i") === col("b.seg_i") && col("a.seg") === col("b.seg") &&
          col("a.L") === col("b.L") && col("a.id") < col("b.id"))
      // THRESHOLDED levenshtein BEFORE the pair dedup: the banded
      // O(k·n) form with early exit (-1 past the bound) is cheap enough
      // that re-verifying a pair once per shared segment beats the wide
      // (id, id, s, s) distinct shuffle the old order paid on every
      // candidate — survivors are rare (blocking recall trades
      // precision), so the post-filter distinct is near-free. Same
      // output set, measured ~3× faster end-to-end.
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr(s"levenshtein(a.s, b.s, $k)").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** The pigeonhole segment rows [[editDistancePairs]] blocks on —
    * shared with the excised-block audit so both see the same keys. */
  private def editSegments(df: DataFrame, k: Int, textCol: String,
                           idCol: String): DataFrame = {
    val nSeg = k + 1
    val t = df.select(col(idCol).as("id"), col(textCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= 1)
    t.select(col("id"), col("s"), length(col("s")).as("L"),
        posexplode(expr(
          s"""IF(length(s) < $nSeg, array(''),
             |  transform(sequence(0, ${nSeg - 1}), i ->
             |    substring(s, i * (length(s) div $nSeg) + least(i, length(s) % $nSeg) + 1,
             |              (length(s) div $nSeg) + IF(i < length(s) % $nSeg, 1, 0))))"""
            .stripMargin)).as(Seq("seg_i", "seg")))
      .select(col("id"), col("s"), col("L"), col("seg_i"), col("seg"))
  }

  /** The recall-loss audit for [[editDistancePairs]]' df cap: every
    * (segment index, segment, length) block the cap EXCISES, with its
    * document frequency — what a corpus owner inspects before trusting
    * the capped default on a new corpus (a hot block here means true
    * duplicate pairs inside it were dropped without verification). One
    * partial-agg groupBy over the segment rows; empty output means the
    * cap never engaged and the capped run was recall-complete.
    */
  def editDistanceExcisedBlocks(df: DataFrame, k: Int = 2,
                                textCol: String = "text",
                                idCol: String = "doc_id",
                                dfCap: Int = EditDistanceDfCap): DataFrame = {
    require(k >= 1, s"editDistanceExcisedBlocks: k=$k must be >= 1")
    editSegments(df, k, textCol, idCol)
      .groupBy(col("seg_i"), col("seg"), col("L"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
  }

  /** Content-defined chunking (the rsync/FastCDC family) at token
    * granularity + corpus-wide chunk dedup: a chunk boundary opens
    * wherever the w-gram rolling fingerprint hits
    * `hash mod 2^maskBits = 0`, so boundaries are CONTENT-anchored —
    * an insertion reshapes only its local chunk, where fixed-width
    * chunking ([[chunkDedup]]) shifts every downstream chunk and
    * destroys their dedup keys. That locality is why CDC chunking is
    * the storage-dedup standard; here it dedups repeated passages
    * across a corpus whose copies drift by small edits.
    *
    * Expected chunk length is 2^maskBits tokens. First occurrence
    * (lowest doc, then chunk index) survives; output mirrors
    * [[chunkDedup]]: per doc the chunk counts + the kept-chunk
    * reassembly.
    *
    * Scale shape: gram hashing is the codegen NGramsJoin+FnvHash64
    * kernel (map-only); boundary sets are per-doc arrays (bounded by
    * doc length); the dedup is ONE window over the chunk-text key —
    * exactly the [[chunkDedup]] shuffle, CDC only changes where
    * boundaries fall.
    */
  def cdcChunkDedup(df: DataFrame, w: Int = 3, maskBits: Int = 4,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(w >= 1 && maskBits >= 1 && maskBits < 62, s"cdcChunkDedup: bad w=$w/maskBits=$maskBits")
    val mask = (1L << maskBits) - 1
    val toks = df.select(col(idCol), split(col(textCol), " ").as("t"))
    // boundary gram-start positions (0-based); gpos 0 would open a chunk
    // before token 0 — a no-op, excluded so chunk ids start at 0
    val bounds = toks
      .select(col(idCol), posexplode(
        graft.functions.TextFunctions.ngrams_join(col("t"), w)).as(Seq("gpos", "gram")))
      .filter(col("gpos") > 0 &&
        (graft.functions.FnvHash64.fnv_hash64(col("gram")).bitwiseAND(mask) === 0))
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("gpos"))).as("bs"))
    val tokRows = toks.join(bounds, Seq(idCol), "left")
      .select(col(idCol), col("bs"), posexplode(col("t")).as(Seq("pos", "tok")))
      .withColumn("chunk_id",
        expr("size(filter(coalesce(bs, array()), p -> p <= pos))"))
    val chunks = tokRows.groupBy(col(idCol), col("chunk_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("chunk_text"))
    val kept = chunks.withColumn("rn", row_number().over(
        Window.partitionBy(col("chunk_text")).orderBy(col(idCol), col("chunk_id"))))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_chunks"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("cleaned"))
    chunks.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept_chunks"), lit(0L)).as("n_kept_chunks"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Embedding near-dup: cosine over candidate pairs. The full pairwise
    * form is the correctness oracle (bounded inputs); the scale path is
    * Similarity.lshCosinePairs.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      Similarity.l2Norm("embedding").as("norm"))
    withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.dot("a.embedding", "b.embedding") /
          (col("a.norm") * col("b.norm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
