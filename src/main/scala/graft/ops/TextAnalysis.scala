package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over the
  * `documents` table. All pure `functions._`/lambda-expression columns —
  * codegen-friendly, no UDFs, shuffle-free (narrow per-row transforms),
  * so they scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: word pieces + standalone punctuation.
    * A regex-segmentation count, the standard cheap proxy for LLM token
    * budgeting when no tokenizer is available.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Stopword hits (fixed tiny stopword list for determinism). */
  def stopwordCount(textCol: String): Column =
    expr(s"size(filter(split($textCol, ' '), x -> x IN ('the','a')))")

  /** Quality features: length, token count, stopword ratio inputs.
    * Ratios are left as integer numerator/denominator pairs so oracle
    * comparison avoids float division ambiguity.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      stopwordCount(textCol).as("n_stop"),
      tokenCountBpe(col(textCol)).as("n_bpe_tokens"))

  /** Document fingerprint: a left-fold polynomial rolling hash over
    * tokens, mod a prime — deterministic and oracle-replicable (DuckDB
    * list_reduce folds the same way). Per-token value uses only
    * length+first-char so both engines agree without sharing a hash fn.
    */
  def fingerprint(textCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(split($textCol, ' '),
         |            t -> CAST(length(t) * 31 + ascii(substr(t, 1, 1)) AS BIGINT)),
         |  CAST(0 AS BIGINT),
         |  (acc, v) -> (acc * 131 + v) % 1000000007)""".stripMargin)

  /** Language-ID by stopword/character-profile voting — the classic
    * n-gram-free heuristic: score each candidate language by hits of its
    * marker tokens, pick argmax (ties break lexicographically).
    * Deterministic; the synthetic corpus carries a `lang` ground-truth
    * column for accuracy eval in tests.
    */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "la", "les", "et"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Word n-grams of a token array as an array column — the codegen
    * `NGramsJoin` kernel (space-joined, order-preserving, empty when the
    * doc has fewer than n tokens).
    */
  def ngrams(tokens: Column, n: Int): Column = {
    require(n >= 2 && n <= 5, s"ngrams: n=$n out of supported range")
    graft.functions.TextFunctions.ngrams_join(tokens, n)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, appendix A1.1 —
    * public heuristic): duplicate-token fraction and most-frequent-n-gram
    * share, the standard signals for filtering degenerate/repetitive
    * documents from a training corpus. Emitted as integer
    * numerator/denominator pairs (ratio-free) for oracle parity.
    *
    * Scale shape: the per-doc token stats are narrow codegen columns; the
    * top-gram stats shuffle on (doc_id, gram) then doc_id — bounded keys,
    * partial aggregation map-side, no skew risk (grams are near-unique).
    */
  def repetitionMetrics(df: DataFrame, textCol: String = "text",
                        includeStopwords: Boolean = false): DataFrame = {
    val toks = df.select(col("doc_id"), split(col(textCol), " ").as("t"))
    // n_stop rides the same narrow `words` projection (one corpus scan);
    // computing it in a separate scan + shuffle-join was the bench's
    // slowest query (pipeline_gopher_filter, 6.98 s → the r8 regression)
    val wordCols = Seq(
      col("doc_id"),
      size(col("t")).as("n_tokens"),
      size(array_distinct(col("t"))).as("n_distinct_tokens")) ++
      (if (includeStopwords)
        Seq(size(filter(col("t"), x => x === "the" || x === "a")).as("n_stop"))
      else Nil)
    val words = toks.select(wordCols: _*)
    // both gram orders in ONE pass: tag each gram with its n, aggregate
    // once on (doc_id, n, gram), then fold the two orders side-by-side
    // with conditional aggregates — one corpus scan, not one per order
    val grams = toks.select(col("doc_id"),
      explode(concat(
        transform(ngrams(col("t"), 2), g => struct(lit(2).as("n"), g.as("gram"))),
        transform(ngrams(col("t"), 3), g => struct(lit(3).as("n"), g.as("gram"))))).as("ng"))
      .select(col("doc_id"), col("ng.n").as("n"), col("ng.gram").as("gram"))
      .groupBy(col("doc_id"), col("n"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, col("c"))).as("top2_count"),
        sum(when(col("n") === 2, col("c"))).as("n_2grams"),
        max(when(col("n") === 3, col("c"))).as("top3_count"),
        sum(when(col("n") === 3, col("c"))).as("n_3grams"))
    val outCols = Seq(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
      coalesce(col("top2_count"), lit(0L)).as("top2_count"),
      coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
      coalesce(col("top3_count"), lit(0L)).as("top3_count"),
      coalesce(col("n_3grams"), lit(0L)).as("n_3grams")) ++
      (if (includeStopwords) Seq(col("n_stop")) else Nil)
    words
      .join(grams, Seq("doc_id"), "left")
      .select(outCols: _*)
  }

  /** PII patterns in the Java∩RE2 regex subset (no backreferences or
    * lookaround) so Spark and any RE2-based engine agree match-for-match.
    * Recall-over-precision by design (a scrub pass): octets up to 999
    * match, and a 5-octet run like `1.2.3.4.5` redacts its first four
    * octets (RE2 has no lookbehind to anchor the left edge).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** HTML/markup → text: the extraction step between a web crawl and
    * every other text operator (C4 runs it before any filtering).
    * Script/style elements drop with their CONTENT (code is not prose),
    * remaining tags and comments become spaces, the five core character
    * entities decode exactly once (`&amp;` last, so `&amp;lt;` yields
    * the literal `&lt;` — the HTML spec's double-escape behavior), and
    * whitespace collapses. All RE2-safe regexes ((?is) flags +
    * non-greedy, no lookarounds), fully codegen, shuffle-free; a real
    * DOM extractor (trafilatura-class) is a library choice this column
    * contract slots under. */
  def stripMarkup(c: Column): Column = {
    // one regex PER element — the alternation form
    // `<(script|style)>.*?</(script|style)>` terminates a <script> at
    // the first </style>, leaking the remaining script payload as
    // "prose"; a backreference would fix it but leave the RE2-safe
    // subset, so each element gets its own anchored pattern
    val noScript = regexp_replace(
      regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Redact emails, IPv4 addresses and phone-shaped numbers — the
    * standard pre-training scrub pass. Narrow per-row regex transforms,
    * fully codegen, shuffle-free; order is fixed (email → ip → phone) so
    * the output is deterministic.
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-pattern hit counts, for corpus-level PII rate reporting. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ip"    -> regexp_count(text, lit(Ipv4Re)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)))

  /** Benchmark-contamination check: per corpus document, how many of its
    * distinct word n-grams appear anywhere in the benchmark set — the
    * decontamination primitive every training pipeline runs before
    * training (n-gram collision against eval suites).
    *
    * Scale shape: the benchmark side (eval suites) is tiny relative to a
    * 100 TB corpus, so its distinct-gram set is broadcast — the corpus
    * side never shuffles for the join; the only exchanges are the per-doc
    * distinct/count aggregations keyed on doc_id.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int,
                    textCol: String = "text"): DataFrame = {
    // within-doc gram dedup happens row-side (array_distinct BEFORE the
    // explode) — the per-doc distinct needs no shuffle; only the tiny
    // benchmark side pays a cross-doc distinct. Docs shorter than n
    // tokens have no grams and are (by contract) absent from the output.
    val corpusGrams = corpus
      .select(col("doc_id"),
        explode(array_distinct(ngrams(split(col(textCol), " "), n))).as("gram"))
    val benchGrams = benchmark
      .select(explode(ngrams(split(col(textCol), " "), n)).as("gram"))
      .distinct()
    val perDoc = corpusGrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    perDoc.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** Context-window chunking: split each document into fixed-size token
    * windows with overlap — the step that turns raw documents into
    * training sequences. One narrow projection (sequence → explode →
    * slice), shuffle-free, so it scales with input splits; chunk_no is
    * derived from the start offset, not a window function.
    */
  def chunk(df: DataFrame, width: Int, overlap: Int,
            textCol: String = "text"): DataFrame = {
    require(width > overlap && overlap >= 0, s"chunk: width=$width overlap=$overlap")
    val stride = width - overlap
    df.select(col("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), greatest(size(col("t")) - overlap, lit(1)),
          lit(stride))).as("start"))
      .select(
        col("doc_id"),
        expr(s"CAST((start - 1) div $stride AS BIGINT)").as("chunk_no"),
        size(slice(col("t"), col("start"), lit(width))).as("n_chunk_tokens"),
        array_join(slice(col("t"), col("start"), lit(width)), " ").as("chunk_text"))
  }

  /** Frequency-ranked vocabulary over the corpus: the topK most frequent
    * tokens get ids 0..topK-1 (rank by count desc, then token, so the
    * assignment is total-order deterministic). The distinct-token
    * frequency table is unbounded at corpus scale, so the top-K cut runs
    * distributed first (`orderBy.limit` → TakeOrderedAndProject); only
    * the topK survivors see the single-partition rank window.
    */
  def buildVocab(df: DataFrame, topK: Int, textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topK)
      .select(col("token"), (row_number().over(w) - 1).as("id"))
  }

  /** Tokenize documents to id sequences against a vocabulary —
    * out-of-vocab tokens map to -1 (UNK). The step that turns cleaned
    * text into model-ready training sequences. The vocab is broadcast
    * (vocabularies are ~100k rows; the corpus never shuffles for the
    * join); order is restored via a position-sorted collect, keyed only
    * on doc_id.
    */
  def tokenizeToIds(df: DataFrame, vocab: DataFrame,
                    textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .join(broadcast(vocab), col("tok") === vocab("token"), "left")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("id"), lit(-1)).as("id")))),
          s => s.getField("id").cast("string")),
        ",").as("ids_csv"))

  def langId(textCol: String): Column = {
    // regexp_count over a word-boundary alternation: native codegen'd
    // regex, one pass per language — ~5× faster than interpreted
    // filter-lambda token counting at bench
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      (lang, regexp_count(col(textCol), lit(ws.mkString("\\b(", "|", ")\\b"))))
    }
    // argmax via arrays: array_position returns the FIRST max ⇒
    // lexicographic tie-break for the sorted lang list; 'und' when all 0.
    // (A nested when(struct…) fold would duplicate each score subtree
    // exponentially — measured 2.2 s vs 0.5 s at sf0.1.)
    val scoreArr = array(scores.map(_._2): _*)
    val langArr  = array(scores.map(s => lit(s._1)): _*)
    val best     = array_max(scoreArr)
    when(best > 0,
      element_at(langArr, array_position(scoreArr, best).cast("int")))
      .otherwise(lit("und"))
  }

  /** Hashed-feature linear quality classifier — the fastText-style bag
    * of hashed tokens every production data pipeline runs for document
    * scoring: each token hashes to one of 1024 feature buckets
    * (FNV-64a, codegen kernel), each bucket carries a weight, the
    * document score is the sum. Integer arithmetic end-to-end
    * (milli-unit weights, BIGINT sum) so the score is bit-stable across
    * engines. The weight table is a deterministic function of the
    * bucket id (a Knuth-multiplicative spread into [-1000, 1000]) — an
    * honest stand-in for trained weights, which the environment has no
    * way to produce; the scale-relevant parts (hashing, bucketing, the
    * per-row fold, zero shuffle) are real.
    */
  /** Curriculum mixture sampling: given per-source target weights and a
    * global token budget (a percentage of the corpus), compute each
    * source's keep rate and apply it with the shared doc-id-keyed FNV
    * keep-hash — the data-mixing step of a training run ("40% web, 30%
    * code, …" at a fixed token count). Rates are DATA-DEPENDENT (unlike
    * `sample_stratified`'s fixed rates): allotted_s = budget·w_s/W,
    * threshold_ppm = min(1e6, allotted_s·1e6/T_s). Integer division
    * end-to-end; the saturated branch (allotted ≥ T_s → keep all) is
    * taken BEFORE the ·1e6 scaling, so the math stays inside signed
    * 64 bits for any per-source token count up to ~9.2e12 — engine-
    * exact far past the 100 TB design point.
    *
    * Scale shape: two narrow corpus scans (one for per-source token
    * totals — a tiny partial-agg'd groupBy — one for the filtered
    * count), rates broadcast back; no corpus-sized shuffle. Weights
    * here are a deterministic function of the source name (stand-in
    * for a user-supplied mixture spec).
    */
  def mixCurriculum(df: DataFrame, budgetPct: Int = 60,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val wS = when(length(col("source")) === 4, lit(3L)).otherwise(lit(1L))
    val toks = df.select(
      col("source"), col("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      graft.functions.FnvHash64.keepHashPpm(col("doc_id")).as("ppm"))
    val bySource = toks.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t_s"))
      .withColumn("w_s", wS)
    val totals = bySource.agg(
      sum(col("t_s")).as("t_total"), sum(col("w_s")).as("w_total"))
    val rates = bySource.crossJoin(broadcast(totals))
      .withColumn("a_s", expr(s"t_total * $budgetPct div 100 * w_s div w_total"))
      .withColumn("threshold_ppm",
        when(col("a_s") >= col("t_s"), lit(1000000L))
          .otherwise(expr("a_s * 1000000 div t_s")))
      .select(col("source"), col("threshold_ppm"))
    toks.join(broadcast(rates), "source")
      .groupBy(col("source"), col("threshold_ppm"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("ppm") < col("threshold_ppm"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("ppm") < col("threshold_ppm"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
  }

  /** Per-document top-k distinctive terms by the LINEAR-idf variant of
    * tf-idf: score ∝ tf·(N/df), i.e. `tf·1e6 div df` (N constant per
    * corpus drops out of the ranking). Deliberately NOT the classic
    * `tf·log(N/df)`: the log-free form stays integer-exact across
    * engines (no float-log ULP drift near rank boundaries) at the cost
    * of weighting rare terms more aggressively than log idf — a
    * documented trade, not an equivalence. Ties break lexicographically.
    *
    * Scale shape: one shuffle to aggregate (doc, term) counts (partial
    * agg does the heavy lifting map-side), one term-keyed shuffle for
    * document frequencies joined back on term — the same bounded-key
    * equi-join posture as the dedup family. The per-doc top-k window
    * partitions by doc_id, never globally sorts.
    */
  def tfidfTopK(df: DataFrame, k: Int = 3, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_milli").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score_milli", expr("tf * 1000000 div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("score_milli"))
  }

  /** DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"):
    * rank RAW-corpus documents by how much their hashed n-gram feature
    * profile looks like a TARGET domain. The paper weights by
    * Π p_target(f)/p_raw(f) in log space; logs are float-transcendental
    * (engine-ULP-unstable near rank boundaries), so this computes the
    * integer-exact LINEAR surrogate — per-feature likelihood-ratio
    * weight `w(f) = target_count(f)·10⁶ div raw_count(f)` averaged over
    * the document's feature occurrences (`Σ tf·w div Σ tf` — the mean
    * keeps ranking LENGTH-NORMALIZED: an unnormalized sum lets any long
    * off-domain doc out-mass a short on-domain one). A documented
    * surrogate (same stance as [[tfidfTopK]]'s linear idf): monotone in
    * each feature's target/raw ratio, not the paper's product form.
    *
    * Features are the paper's hashed n-grams: token bigrams FNV-hashed
    * into `nBuckets`. Scale shape: both count tables are ≤nBuckets rows
    * after partial-agg'd shuffles and broadcast back; the per-doc score
    * is one bounded-key join + one doc-keyed aggregation. Overflow
    * bound: the PER-DOCUMENT numerator `Σ_buckets tf·w_ppm`
    * (≤ doc_tokens · max w_ppm ≤ doc_tokens · target_total · 10⁶) must
    * fit in i64 — w_ppm ≤ target_count·10⁶ only when a feature is raw-
    * unique, and the sum is what Spark would silently wrap. Target
    * corpora are small by construction (that is the method's point);
    * with a 10⁴-token target and 10⁴-token docs the numerator stays
    * below 10¹⁴.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, nBuckets: Int = 4096,
                 textCol: String = "text"): DataFrame = {
    def buckets(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ explode(graft.functions.TextFunctions.ngrams_join(
          split(col(textCol), " "), 2)).as("gram"): _*)
        .withColumn("bucket",
          pmod(graft.functions.FnvHash64.fnv_hash64(col("gram")), lit(nBuckets.toLong)))
        .drop("gram")
    val targetCounts = buckets(target, Nil)
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_count"))
    // ONE tokenize+hash pass over the big raw side: corpus-level bucket
    // counts derive from the per-doc tf aggregate (identical subplan →
    // Spark reuses the exchange; a separate buckets(raw) scan would
    // re-run the expensive split+ngram+FNV work)
    val tf = buckets(raw, Seq(col("doc_id")))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("tf"))
    val rawCounts = tf.groupBy(col("bucket")).agg(sum(col("tf")).as("r_count"))
    val weights = rawCounts.join(targetCounts, Seq("bucket"), "left")
      .select(col("bucket"),
        expr("coalesce(t_count, 0L) * 1000000 div r_count").as("w_ppm"))
    tf.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(expr("sum(tf * w_ppm) div sum(tf)").as("dsir_score_ppm"))
  }

  /** Per-source distribution drift: total-variation distance between
    * each source's unigram token distribution and the corpus-wide one,
    * in ppm — the mixing diagnostic that answers "which source is
    * lexically unlike the blend" before weights are chosen (TV rather
    * than KL/JS: exact under integer fixed-point, no cross-engine log
    * ULPs, and it is the metric the mixture actually moves — reweighting
    * a source shifts the blend by at most its TV).
    *
    * Exact without a per-source × vocabulary join: with p = source
    * distribution and q = corpus distribution (both floored to ppm),
    * 2·TV = Σ_present |p−q| + Σ_absent q, and the absent mass is
    * Q_total − Σ_present q where `Q_total = Σ_vocab q_ppm` is ONE
    * corpus-wide scalar — so only (source, token) PRESENT pairs ever
    * materialize. One tokenize pass, (source,token) partial-agg
    * shuffle, token-keyed corpus counts derived FROM that aggregate
    * (nothing re-tokenizes), one bounded join token→(m, q), broadcast
    * totals. Fixed-point floors are the defined cross-engine contract
    * (the mix-rate posture); Σ tv contributions ≤ 2·10⁶ per source so
    * i64 never wraps.
    */
  def sourceDivergence(df: DataFrame, groupCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    val st = df.select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("n"))
    val corpus = st.groupBy(col("token")).agg(sum(col("n")).as("m"))
    // totals ride as broadcast single-row aggregates (never an eager
    // scalar — that would re-run the tokenize once per scalar)
    val q = corpus.crossJoin(broadcast(corpus.agg(sum(col("m")).as("__M"))))
      .select(col("token"), expr("m * 1000000 div __M").as("q_ppm"))
    val nS = st.groupBy(col(groupCol))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val perSrc = st.join(q, Seq("token"))
      .join(broadcast(nS), Seq(groupCol))
      .groupBy(col(groupCol), col("n_tokens"), col("n_distinct"))
      .agg(sum(abs(expr("n * 1000000 div n_tokens") - col("q_ppm"))).as("__present"),
        sum(col("q_ppm")).as("__q_present"))
    perSrc.crossJoin(broadcast(q.agg(sum(col("q_ppm")).as("__qt"))))
      .select(col(groupCol), col("n_tokens"), col("n_distinct"),
        expr("(__present + (__qt - __q_present)) div 2").as("tv_ppm"))
  }

  /** Corpus version diff: classify every doc id across two corpus
    * versions as added / removed / modified / unchanged by content
    * hash — the audit step between pipeline runs ("what did this stage
    * change"). Full outer join on the id (one shuffle, both sides
    * pre-hashed so only (id, hash) pairs move, never text).
    */
  def corpusDiff(before: DataFrame, after: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // presence travels as its own marker — md5(NULL) is NULL, so hash
    // nullity can NOT distinguish "absent row" from "present with NULL
    // text" (a NULL-text doc in both versions is unchanged, not added)
    val b = before.select(col(idCol), md5(col(textCol)).as("h_before"),
      lit(true).as("in_before"))
    val a = after.select(col(idCol), md5(col(textCol)).as("h_after"),
      lit(true).as("in_after"))
    b.join(a, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("in_before").isNull, lit("added"))
          .when(col("in_after").isNull, lit("removed"))
          .when(col("h_before") <=> col("h_after"), lit("unchanged"))
          .otherwise(lit("modified")))
      .select(col(idCol), col("change"))
  }

  /** Corpus-wide most-frequent n-grams — the boilerplate detector
    * (navigation chrome, cookie banners, license headers surface as
    * corpus-level heavy hitters; C4 strips lines this way). Exact
    * counts: one (gram) shuffle with map-side partial aggs, then a
    * TakeOrderedAndProject top-k — no global sort. At 100 TB the same
    * shape runs on a sampled fraction first (heavy hitters survive
    * sampling by definition); the exact pass is for the shortlist.
    */
  def topNgrams(df: DataFrame, n: Int, k: Int,
                textCol: String = "text"): DataFrame =
    df.select(explode(graft.functions.TextFunctions.ngrams_join(
        split(col(textCol), " "), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)

  /** Per-document boilerplate score: the share (ppm) of a document's
    * DISTINCT word n-grams that are corpus-common (document frequency
    * ≥ `minDf`) — the per-doc complement of [[topNgrams]], and the
    * signal RefinedWeb/CCNet-style line filters approximate: a document
    * made mostly of grams that recur across ≥ minDf documents is
    * navigation/template boilerplate, not content. Integer-exact
    * (count div count — no float ratio).
    *
    * Scale shape: distinct grams per doc (narrow explode), a df
    * AGGREGATE (not a window count — partial aggregation absorbs a
    * viral gram map-side, where a count-over-gram-partition window
    * would serialize every occurrence into one task), a gram-keyed
    * join-back, then one groupBy on doc_id. The gram explode is
    * evaluated on both sides of the join (the df side's partial agg
    * sits below its exchange, so the shuffles can't unify) — a
    * deliberate trade: recomputing a narrow projection beats either
    * pinning token-scale state or the window's hot-key cliff. Docs
    * shorter than n tokens have no grams and score 0 over 0.
    */
  def boilerplateScore(df: DataFrame, n: Int = 3, minDf: Int = 100,
                       textCol: String = "text"): DataFrame = {
    require(minDf >= 2, s"boilerplateScore: minDf=$minDf must be >= 2")
    val grams = df.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions.ngrams_join(
        split(col(textCol), " "), n))).as("gram"))
    // df as an unordered window count over the gram key — one pass and
    // one shuffle instead of the groupBy + join-back double scan
    val perDoc = grams.withColumn("gram_df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gram_df") >= minDf, 1L).otherwise(0L)).as("n_common"))
    df.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(expr("n_common * 1000000 div n_grams"), lit(0L))
          .as("boilerplate_ppm"))
  }

  /** Feature-hashing document embedding (Weinberger et al. 2009, the
    * public "hashing trick"): each token lands in bucket
    * `FNV-64a(token) mod dim` with a ±1 sign drawn from the hash's next
    * bit, and the document vector is the per-bucket signed count —
    * signed hashing keeps inner products unbiased, so the output feeds
    * the ANN/dedup family ([[Similarity]] cosine/LSH/IVF) as a
    * model-free `Array[Float]` embedding with `doc_id` as `vec_id`.
    *
    * One codegen kernel call per row ([[graft.functions.HashEmbedVec]]
    * — the composable HOF fold copies the dim-wide accumulator once
    * per token; the kernel accumulates in place), ZERO shuffles:
    * embedding generation at 100 TB is map-only and scales with input
    * splits. `dim` must be a power of two so the bucket is the low
    * log₂(dim) hash bits (≡ the unsigned residue — the classifier-twin
    * identity) and the sign bit sits just above them. Values are
    * integral (signed counts) cast to float — exactly representable,
    * so downstream dot products stay engine-replicable.
    */
  def hashEmbedding(df: DataFrame, dim: Int = 64,
                    textCol: String = "text"): DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"hashEmbedding: dim=$dim must be a power of two")
    df.select(col("doc_id").as("vec_id"),
      graft.functions.TextFunctions.hash_embed(split(col(textCol), " "), dim)
        .as("embedding"))
  }

  /** Pairwise source-overlap matrix: for every pair of sources that
    * share at least one distinct word n-gram, the intersection size and
    * integer Jaccard (ppm) over their distinct-gram sets — the corpus
    * report that surfaces mirrored/scraped-twice sources BEFORE mixing
    * weights are committed (two sources with jaccard_ppm near 10⁶ are
    * the same crawl twice; UniMax would double-budget them).
    *
    * Scale shape: distinct (source, gram) pairs — ONE shuffle — then a
    * self-equi-join on gram whose per-key fanout is bounded by the
    * SOURCE count (each gram contributes ≤ |sources_containing_it|²
    * pairs, never a per-document blowup), and the self-join reuses the
    * distinct's exchange. Sized for source/domain cardinality in the
    * hundreds-to-thousands; the output is |source pairs| rows, tiny.
    * Zero-overlap pairs don't appear (their Jaccard is 0).
    */
  /** Per-source corpus-health profile — the per-provenance report a
    * Dolma/RedPajama-style pipeline publishes with every release: doc
    * and token counts, distinct-token vocabulary, type-token ratio
    * (ppm — a collapsed TTR flags a degenerate/boilerplate source long
    * before any quality model does), and mean document length (milli).
    * All integer-exact.
    *
    * Scale shape: totals are one doc-level partial agg (token counts
    * from `size(split)`, no explode); the vocabulary needs the explode,
    * but `countDistinct` compiles to a two-phase agg on (source, token)
    * whose partial collapses repeats map-side — the shuffle carries the
    * per-source vocabulary, not the token stream.
    */
  def sourceProfile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("source"), split(col(textCol), " ").as("t"))
    val base = toks.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("t")).cast("long")).as("total_tokens"))
    val dist = toks.select(col("source"), explode(col("t")).as("w"))
      .groupBy(col("source")).agg(countDistinct(col("w")).as("distinct_tokens"))
    base.join(dist, Seq("source"))
      .withColumn("ttr_ppm",
        expr("distinct_tokens * 1000000 div nullif(total_tokens, 0)"))
      .withColumn("mean_doc_tokens_milli",
        expr("total_tokens * 1000 div n_docs"))
  }

  def sourceOverlap(df: DataFrame, n: Int = 3, textCol: String = "text",
                    groupCol: String = "source"): DataFrame = {
    val sg = df.select(col(groupCol).as("src"),
      explode(array_distinct(graft.functions.TextFunctions.ngrams_join(
        split(col(textCol), " "), n))).as("gram"))
      .distinct()
    val sizes = sg.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val inter = sg.as("a").join(sg.as("b"),
        col("a.gram") === col("b.gram") && col("a.src") < col("b.src"))
      .select(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("src").as("source_a"), col("n").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("src").as("source_b"), col("n").as("n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("n_common * 1000000 div (n_a + n_b - n_common)").as("jaccard_ppm"))
  }

  /** The 100 TB path of [[sourceOverlap]]: per-source HLL sketches of
    * the distinct-gram sets, pairwise intersection by inclusion-
    * exclusion — `|A∩B| ≈ est(A) + est(B) − est(A∪B)` with the union
    * estimated from `hll_union` of the two sketches, NEVER from data.
    * The exact operator's distinct + self-equi-join shuffles every
    * (source, gram) pair twice; this one reads the corpus once into
    * lgK=12 sketch states (map-side combined) and every pairwise step
    * runs over the |sources|-row aggregate — the all-pairs join is
    * source-cardinality², a dashboard-sized nested loop by design.
    * Estimates are deterministic (fixed sketch hash) and each carries
    * ~1.6% RSE; the inclusion-exclusion difference inherits the sum of
    * the three errors, so gates should bound against the UNION size.
    */
  def sourceOverlapApprox(df: DataFrame, n: Int = 3, textCol: String = "text",
                          groupCol: String = "source"): DataFrame = {
    val sk = df.select(col(groupCol).as("src"),
        explode(graft.functions.TextFunctions.ngrams_join(
          split(col(textCol), " "), n)).as("gram"))
      .groupBy(col("src"))
      .agg(expr("hll_sketch_agg(gram)").as("sk"))
    sk.as("a").join(sk.as("b"), col("a.src") < col("b.src"))
      .select(col("a.src").as("source_a"), col("b.src").as("source_b"),
        expr("cast(hll_sketch_estimate(a.sk) as bigint)").as("est_a"),
        expr("cast(hll_sketch_estimate(b.sk) as bigint)").as("est_b"),
        expr("cast(hll_sketch_estimate(hll_union(a.sk, b.sk)) as bigint)")
          .as("est_union"))
      .withColumn("est_common",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  /** BM25-shaped keyword retrieval over the corpus: rank documents for a
    * fixed term set by `idf · tf-saturation · length-normalization` —
    * the retrieval primitive data curation uses (find docs matching an
    * eval query for decontamination, surface topical subsets for
    * mixing). All arithmetic is integer fixed-point so rankings are
    * engine-exact (the same no-float-ULP-near-boundaries stance as
    * [[tfidfTopK]]):
    *
    *   idf_ppm     = N·10⁶ div df                 (linear idf — documented
    *                                               trade vs log idf)
    *   norm_milli  = 1000 − b + b·dl·1000 div avgdl_milli
    *   denom_milli = tf·1000 + k1·norm_milli div 1000
    *   contrib     = idf_ppm · tf · (k1+1000) div denom_milli
    *   score_milli = Σ contrib                     (integer sum, order-free)
    *
    * with k1/b as milli-scaled constants (defaults 1.2/0.75). Overflow
    * bound: the worst single contribution is `N·idfScale·tf·(k1+1000)`
    * (df=1), which must fit in i64 — with the default ppm idf and
    * tf ≤ 1000 that caps N at ≈ 4·10⁶ docs. For larger corpora pass a
    * smaller `idfScale` (per-mille 10³ lifts the cap to N ≈ 4·10⁹; the
    * score loses idf resolution, not correctness).
    *
    * Scale shape: the term filter prunes the exploded token stream to
    * query-term hits BEFORE any shuffle (predicate on a narrow explode);
    * per-(doc,term) counts partial-agg map-side; document frequencies are
    * a tiny per-term aggregate broadcast back; the global stats (N,
    * avgdl) are one two-long aggregate folded into the plan as literals.
    * Final top-k is orderBy+limit = TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver, never a global sort).
    */
  /** CCNet-style LM quality scoring (Wenzek et al. 2020 score web text
    * with a KenLM trained on clean reference text and bucket by
    * perplexity): an add-one-smoothed BIGRAM likelihood of each document
    * under a model fit on `reference`, as the engine's integer-exact
    * surrogate — each bigram contributes
    * `floor(10⁶·(c(w₁w₂)+1)/(c(w₁)+V))` (an exact integer from exact
    * integers: order-free BIGINT sums, no logs), and the per-doc score
    * is the micro-probability mean over its bigrams. Monotone in the
    * smoothed likelihood per bigram, so thresholds/buckets rank the
    * same direction as perplexity would; the log-product form is
    * documented as the float trade this engine refuses (libm `ln` is
    * not bit-portable, sums of it are not oracle-exact).
    *
    * Scale shape: the model is two count tables from one reference
    * scan (bigram + unigram, partial-agg'd); scoring is two equi-joins
    * on the bigram/prefix keys — no broadcast of the corpus, and the
    * model tables shuffle once each. `V` (reference vocab size) is one
    * tiny eager agg, the documented bm25-stats stance. Out-of-model
    * bigrams smooth to `floor(10⁶/(c(w₁)+V))` ≥ 0, never null. Docs
    * with < 2 tokens have no bigrams and score 0 with n_bigrams 0.
    */
  def lmLikelihoodMilli(docs: DataFrame, reference: DataFrame,
                        textCol: String = "text"): DataFrame = {
    // same single-scan stance as stupidBackoffMilli: bigram counts,
    // unigram counts, and the V action all read this one token frame
    val refToks = reference.select(split(col(textCol), " ").as("t")).localCheckpoint()
    val refBi = refToks
      .select(explode(graft.functions.TextFunctions.ngrams_join(col("t"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    val refUni = refToks
      .select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = refUni.count() // V: one tiny eager agg (bm25-stats stance)
    require(vocab > 0, "lmLikelihoodMilli: empty reference corpus fits no model")
    val docBi = docs
      .select(col("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.ngrams_join(col("t"), 2)).as("bigram"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val scored = docBi
      .join(refBi, Seq("bigram"), "left")
      .join(refUni, Seq("w1"), "left")
      .select(col("doc_id"),
        expr(s"(1000000L * (coalesce(cb, 0L) + 1L)) div (coalesce(cu, 0L) + ${vocab}L)")
          .as("term_micro"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_micro")).as("micro_sum"), count(lit(1)).as("n_bigrams"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(expr("micro_sum div n_bigrams"), lit(0L)).as("score_micro"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — THE web-scale LM: no discounting,
    * back off to the next-lower order with a fixed 0.4 multiplier, which
    * at Google's corpus sizes matched Kneser-Ney). Per full-trigram
    * position, integer-exact at micro scale (the lmLikelihoodMilli
    * stance — order-free BIGINT sums, no logs):
    *
    *  - trigram tier (observed `w₂ w₁ w`):   `(10⁶·c₃) div c₂(w₂ w₁)`
    *  - bigram tier (observed `w₁ w`):       `(4·10⁵·c₂) div c₁(w₁)`
    *    (0.4·10⁶ is exact)
    *  - unigram tier (observed `w`):         `(16·10⁴·c₁) div N`
    *    (0.4²·10⁶ is exact; N = reference token count)
    *  - unseen word: 0 (S(w) = c(w)/N is 0 at c=0 — stupid backoff has
    *    no vocabulary smoothing by design)
    *
    * Tier choice is by n-gram EXISTENCE in the model, not score > 0, so
    * a floor-to-zero high-order hit never silently falls through. The
    * denominators are total by construction: an observed trigram's
    * prefix bigram and an observed bigram's head unigram are counted
    * from the same reference token stream. Only full-trigram positions
    * score (no sentence padding); docs with < 3 tokens score 0 with
    * n_trigrams 0. BIGINT headroom: exact up to ~9·10¹² occurrences of
    * a single n-gram (10⁶·c₃ must fit a long).
    *
    * Scale shape: the model is three count tables from one reference
    * scan (tri/bi/uni, partial-agg'd, each bounded by distinct-n-gram
    * count, not corpus size); scoring explodes each doc into trigram
    * strings ONCE (each carries its own context — no self-join, no
    * window over token positions) and runs five equi-joins against the
    * count tables. At CCNet geometry (fixed clean reference, e.g.
    * Wikipedia, vs an unbounded web corpus) the model tables are
    * per-order broadcast candidates; here they shuffle once each and
    * AQE picks the strategy.
    */
  def stupidBackoffMilli(docs: DataFrame, reference: DataFrame,
                         textCol: String = "text"): DataFrame = {
    // tokenize the reference ONCE: the token frame feeds four readers
    // (tri/bi/uni counts + the N action) — without the checkpoint each
    // would re-scan and re-split the reference corpus
    val refToks = reference.select(split(col(textCol), " ").as("t")).localCheckpoint()
    val refTri = refToks
      .select(explode(graft.functions.TextFunctions.ngrams_join(col("t"), 3)).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("c3"))
    val refBi = refToks
      .select(explode(graft.functions.TextFunctions.ngrams_join(col("t"), 2)).as("bi"))
      .groupBy(col("bi")).agg(count(lit(1)).as("c2"))
    val refUni = refToks
      .select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // N: one tiny eager agg (the bm25-stats / lmLikelihood-V stance);
    // sum over ZERO rows is SQL NULL — surface the loud require, not a
    // null-read crash
    val nRow = refUni.agg(sum(col("c1"))).head
    val nTokens = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(nTokens > 0, "stupidBackoffMilli: empty reference corpus fits no model")
    val docTri = docs
      .select(col("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.ngrams_join(col("t"), 3)).as("tri"))
      .withColumn("p", split(col("tri"), " "))
      .select(col("doc_id"), col("tri"),
        concat_ws(" ", col("p").getItem(0), col("p").getItem(1)).as("bipre"),
        concat_ws(" ", col("p").getItem(1), col("p").getItem(2)).as("bi"),
        col("p").getItem(1).as("w1"),
        col("p").getItem(2).as("w"))
    val scored = docTri
      .join(refTri, Seq("tri"), "left")
      .join(refBi.withColumnRenamed("bi", "bipre")
        .withColumnRenamed("c2", "c2pre"), Seq("bipre"), "left")
      .join(refBi, Seq("bi"), "left")
      .join(refUni.withColumnRenamed("w", "w1")
        .withColumnRenamed("c1", "c1pre"), Seq("w1"), "left")
      .join(refUni, Seq("w"), "left")
      .select(col("doc_id"), expr(
        s"""CASE WHEN c3 IS NOT NULL THEN (1000000L * c3) div c2pre
           |     WHEN c2 IS NOT NULL THEN (400000L * c2) div c1pre
           |     WHEN c1 IS NOT NULL THEN (160000L * c1) div ${nTokens}L
           |     ELSE 0L END""".stripMargin).as("term_micro"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_micro")).as("micro_sum"), count(lit(1)).as("n_trigrams"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(expr("micro_sum div n_trigrams"), lit(0L)).as("score_micro"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"))
  }

  def bm25TopK(df: DataFrame, queryTerms: Seq[String], k: Int = 10,
               k1Milli: Long = 1200L, bMilli: Long = 750L,
               textCol: String = "text", idfScale: Long = 1000000L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = df.select(col("doc_id"), split(col(textCol), " ").as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head
    // sum over ZERO rows is SQL NULL — an empty corpus must yield an
    // empty result, not an NPE at plan-build time
    val nDocs = stats.getLong(0)
    val totTokens = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val avgdlMilli = math.max(totTokens * 1000L / math.max(nDocs, 1L), 1L)
    val tf = toks
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .withColumn("contrib", expr(
        s"""(${nDocs}L * $idfScale div df) * tf * ($k1Milli + 1000) div
           |  (tf * 1000 + $k1Milli * (1000 - $bMilli + $bMilli * dl * 1000 div ${avgdlMilli}L) div 1000)
           |""".stripMargin.replace("\n", " ")))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_milli"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
  }

  /** Unicode-script profile: per-document counts of Latin / CJK /
    * Cyrillic / Arabic / digit characters via explicit codepoint-range
    * classes (engine-neutral: the same ranges compile in any regex
    * dialect, no `\p{Script=...}` dependency). Real language-ID
    * pipelines run script detection BEFORE any model — most of the web
    * is routable on script alone, and the marker-voting [[langId]] only
    * makes sense within Latin script. Narrow codegen'd regexp_count
    * columns, shuffle-free.
    */
  // single-backslash \uXXXX: Scala resolves the escape at COMPILE time,
  // so the pattern string holds literal characters — the one class-range
  // form Java regex and RE2 (DuckDB) read identically. A double-escaped
  // "\\uXXXX" would reach RE2 as an unsupported escape.
  private[graft] val scriptRanges: Seq[(String, String)] = Seq(
    // À-Ö / Ø-ö / ø-ɏ: skips × (U+00D7) and ÷ (U+00F7) — math symbols,
    // not Latin letters; counting them would let '3 × 4' route as latin
    "latin"    -> "[A-Za-zÀ-ÖØ-öø-ɏ]",
    "cjk"      -> "[一-鿿぀-ヿ가-힯]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "arabic"   -> "[؀-ۿ]",
    "digit"    -> "[0-9]")

  def scriptProfile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = scriptRanges.map { case (name, cls) =>
      regexp_count(col(textCol), lit(cls)).cast("long").as(s"n_$name")
    }
    val total = length(col(textCol)).cast("long").as("n_chars_total")
    // dominant script = integer argmax over struct(count, -index): max
    // count wins, ties break toward the earlier name (same pattern as
    // the IVF assignment argmax) — all-zero counts → 'none'
    val names = scriptRanges.map(_._1)
    val entries = array(names.zipWithIndex.map { case (name, i) =>
      struct(col(s"n_$name").as("c"), lit(-i).as("negidx"))
    }: _*)
    val bestC = array_max(entries).getField("c")
    val bestIdx = -array_max(entries).getField("negidx")
    val best = when(bestC === 0, lit("none"))
      .otherwise(element_at(typedLit(names), (bestIdx + 1).cast("int")))
    df.select((col("doc_id") +: counts :+ total): _*)
      .withColumn("dominant_script", best)
  }

  def classifierScoreMilli(textCol: String): Column = {
    val weight = (t: Column) =>
      pmod(graft.functions.FnvHash64.fnv_hash64(t), lit(1024L))
        .multiply(lit(2654435761L)).mod(lit(2001L)).minus(lit(1000L))
    aggregate(transform(split(col(textCol), " "), weight), lit(0L),
      (acc, w) => acc + w)
  }

  /** One learned BPE merge: `lhs + rhs → merged`, with the weighted
    * adjacent-pair count that won the round. */
  final case class BpeMerge(rank: Int, lhs: String, rhs: String,
                            merged: String, weighted_count: Long)

  /** BPE tokenizer training (Sennrich et al. 2016, the published
    * algorithm every LLM pipeline runs): learn `nMerges` merge rules by
    * repeatedly merging the most frequent adjacent symbol pair.
    *
    * Scale shape — the reason BPE fits Spark at 100 TB: the corpus is
    * touched exactly ONCE (explode → word-frequency groupBy); every
    * merge round then runs on the DISTINCT-WORD table (≤ low 10⁸ rows
    * for web-scale corpora — the Sennrich word-dict trick), so the K
    * rounds cost K small shuffles independent of corpus size. Each
    * round is `localCheckpoint`ed: the plan stays O(1) deep and the
    * table is vocabulary-sized.
    *
    * Engine-exact: integer pair counts (overlapping occurrences each
    * count, the reference get_stats behavior), argmax tie-break by
    * pair string ascending, and the merge-apply is a literal replace
    * over a DOUBLE-spaced rendering (" l  r " → " lr " on a string
    * where every symbol separator is exactly two spaces). The doubling
    * matters: each match then consumes only its own wrapping spaces, so
    * left-to-right non-overlapping replace merges consecutive runs of
    * the winning pair ("a a a a" → "aa aa") exactly like the reference
    * regex `(?<!\S)l r(?!\S)` — a shared-delimiter single-space replace
    * would skip every other occurrence. Words end with a `</w>` symbol
    * so merges can't cross word boundaries and end-of-word units are
    * learnable. The per-round 1-row argmax is a driver action by
    * design (the merge RULE is control flow, same stance as the bm25
    * stats row). Stops early if the corpus runs out of pairs.
    */
  def bpeFit(df: DataFrame, nMerges: Int, textCol: String = "text")
      : (Seq[BpeMerge], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64,
      s"bpeFit: nMerges=$nMerges out of range (1..64)")
    // the ONE corpus pass: distinct words + frequencies, then each word
    // as a space-joined symbol string ("c h a r s </w>")
    var words = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        concat_ws(" ", concat(split(col("w"), ""), array(lit("</w>")))).as("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[BpeMerge]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val top = words
        .select(explode(graft.functions.TextFunctions.ngrams_join(
          split(col("sym"), " "), 2)).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val Array(l, r) = pair.split(" ", 2)
        val mergedSym = l + r
        merges += BpeMerge(k, l, r, mergedSym, top(0).getLong(1))
        // double the separators (pad included) so each " l  r " match
        // owns its wrapping spaces — consecutive pairs all merge; then
        // collapse back (every space run is exactly 2 by construction)
        //
        // NOT checkpointed per round: each round is one narrow replace
        // projection over the vocabulary-sized table, so round k's pair
        // count replays k cheap replaces from the ONE corpus-pass
        // checkpoint — Σk ≈ k²/2 vocab-table map passes, versus the k
        // extra materialization JOBS the old per-round eager checkpoint
        // paid (measured: the jobs dominated at every SF; the replaces
        // are codegen string ops on a table ≤ distinct-word count).
        words = words.select(col("w"), col("freq"),
            trim(replace(
              replace(
                concat(lit("  "), replace(col("sym"), lit(" "), lit("  ")),
                  lit("  ")),
                lit(s" $l  $r "), lit(s" $mergedSym ")),
              lit("  "), lit(" "))).as("sym"))
        k += 1
      }
    }
    // ONE final pin for the k-replace lineage: bpeArtifacts/encode/
    // fertility consume `words` from several subtrees (broadcast joins,
    // symbol-count aggs) — without this each consumer would replay the
    // replace chain independently
    (merges.result(), if (k > 1) words.localCheckpoint(true) else words)
  }

  /** The learned merge table as a DataFrame — `bpeFit`'s rule output in
    * training order. K rows; the tokenizer artifact a loader ships. */
  def bpeMerges(df: DataFrame, nMerges: Int,
                textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeFit(df, nMerges, textCol)._1.toDF()
  }

  /** BPE-encode the corpus with a tokenizer fitted on it: each doc
    * becomes its loader-ready subword-id sequence (CSV, mirroring
    * `tokenizeToIds`' contract) plus the id count. Symbol ids are
    * frequency-ranked over the fitted vocabulary (count desc, symbol
    * asc — deterministic), so id 0 is the most common subword.
    *
    * Scale shape: the fit is [[bpeFit]] (corpus touched once, K
    * vocab-table rounds); encoding is then two BROADCAST joins (word →
    * symbol segmentation, symbol → id — both vocabulary-sized) and one
    * per-doc groupBy. The id-assignment window runs over the symbol
    * vocabulary only (chars + merges), never the corpus.
    */
  def bpeEncode(df: DataFrame, nMerges: Int,
                textCol: String = "text"): DataFrame = {
    val (fitted, svocab) = bpeArtifacts(df, nMerges, textCol)
    df.select(col("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("wp", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(fitted.select(col("w"), split(col("sym"), " ").as("syms"))), "w")
      .select(col("doc_id"), col("wp"),
        posexplode(col("syms")).as(Seq("sp", "symbol")))
      .join(broadcast(svocab.select(col("symbol"), col("id"))), "symbol")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ids"),
        array_join(transform(
          array_sort(collect_list(struct(col("wp"), col("sp"), col("id")))),
          s => s.getField("id").cast("string")), ",").as("ids_csv"))
  }

  /** Streaming-legal BPE encode against a PRE-FITTED vocabulary: a
    * tokenizer is trained offline ([[bpeFit]] — multi-pass, inherently
    * batch) and then applied at ingest. The fitted word table collapses
    * to one literal word→ids map, so encoding is a pure per-row
    * projection — no join, no shuffle, no state — and therefore legal
    * in any streaming output mode. Out-of-vocabulary words map to a
    * single -1 (the `tokenizeToIds` UNK contract).
    *
    * The map rides a BROADCAST VARIABLE (driver-collected, torrent-
    * shipped ONCE per executor — a `typedLit` map would instead embed
    * the vocabulary in the plan and reserialize it into every task
    * closure, a real driver/network tax at 2 M entries × thousands of
    * tasks): real tokenizer vocabularies are 32k–500k entries, far
    * under `maxVocabEntries`; past the cap this fails loudly rather
    * than silently shipping a multi-GB broadcast — the broadcast-join
    * batch path ([[bpeEncode]]) is the unbounded form. The per-doc
    * lookup is one UDF call over the words array (the hash probes
    * dominate; there is no codegen win a literal map would add).
    */
  def bpeEncodeWith(stream: DataFrame, fittedWords: DataFrame,
                    symbolIds: DataFrame, textCol: String = "text",
                    maxVocabEntries: Int = 2000000): DataFrame = {
    val ids = symbolIds.collect()
      .map(r => r.getAs[String]("symbol") -> r.getAs[Int]("id")).toMap
    val entries = fittedWords.select(col("w"), col("sym")).collect()
    require(entries.length <= maxVocabEntries,
      s"bpeEncodeWith: fitted vocabulary ${entries.length} exceeds " +
        s"$maxVocabEntries broadcast-map entries — use the bpeEncode batch path")
    val wordToIds: Map[String, Array[Int]] = entries.map { r =>
      r.getString(0) -> r.getString(1).split(" ").map(s =>
        ids.getOrElse(s, -1))
    }.toMap
    val bc = stream.sparkSession.sparkContext.broadcast(wordToIds)
    val encodeDoc = udf { ws: Seq[String] =>
      val m = bc.value
      ws.iterator.flatMap(w => m.getOrElse(w, Array(-1)).iterator)
        .mkString(",")
    }
    // same word stream as the batch path: split, drop empties — and
    // drop WORDLESS docs (null/empty text) entirely, matching the batch
    // encode, which emits no row for a doc with no words (a null/empty
    // size nil-propagates through the `where`)
    val words = filter(split(trim(col(textCol)), "\\s+"),
      w => length(w) > 0)
    stream.select(col("doc_id"), words.as("words_"))
      .where(size(col("words_")) > 0)
      .select(col("doc_id"), encodeDoc(col("words_")).as("ids_csv"))
  }

  /** The fitted artifacts [[bpeEncodeWith]] consumes, from one batch
    * fit: (word→symbols table, frequency-ranked symbol ids). */
  def bpeArtifacts(df: DataFrame, nMerges: Int,
                   textCol: String = "text"): (DataFrame, DataFrame) = {
    val fitted = bpeFit(df, nMerges, textCol)._2
    val symCounts = fitted
      .select(explode(split(col("sym"), " ")).as("symbol"), col("freq"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("cnt"))
    val vw = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("symbol"))
    (fitted, symCounts.withColumn("id", row_number().over(vw) - 1)
      .select(col("symbol"), col("id")))
  }

  /** Per-source tokenizer fertility after `nMerges` BPE rounds: how
    * many symbols the learned tokenizer spends per word in each slice
    * of the corpus — THE feasibility number for a token budget (mixing
    * rates are set in tokens; fertility converts corpus mass to
    * tokens). Integer-exact: Σ freq·|symbols| and Σ freq per source.
    * One corpus pass for per-source word counts + a broadcast join to
    * the vocabulary-sized fitted table.
    */
  def bpeFertility(df: DataFrame, nMerges: Int, textCol: String = "text",
                   groupCol: String = "source"): DataFrame = {
    val fitted = bpeFit(df, nMerges, textCol)._2
      .select(col("w"), size(split(col("sym"), " ")).cast("long").as("n_sym"))
    df.select(col(groupCol),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("f"))
      .join(broadcast(fitted), "w")
      .groupBy(col(groupCol))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * col("n_sym")).as("n_symbols"))
  }

  /** The loader-ready artifact end-to-end: the corpus BPE-ENCODED and
    * concat-and-chopped into fixed `windowTokens` context windows of
    * TOKEN IDS per source — [[bpeEncode]] ∘ the packSequences chop in
    * one plan, at the id level (a doc crossing a boundary continues in
    * the next window; no padding). Output per (source, window): id
    * count + the comma-joined id sequence in stream order.
    *
    * Scale shape: the two broadcast vocab joins of [[bpeEncode]], one
    * per-doc window for in-doc positions, one per-source window for doc
    * start offsets (runs over the doc-count-sized length table, not the
    * id stream), then a single (source, win) partial agg.
    */
  def bpeEncodePacked(df: DataFrame, nMerges: Int, windowTokens: Int,
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (fitted, svocab) = bpeArtifacts(df, nMerges, textCol)
    val symrows = df
      .select(col("doc_id"), col("source"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("wp", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(fitted.select(col("w"), split(col("sym"), " ").as("syms"))), "w")
      .select(col("doc_id"), col("source"), col("wp"),
        posexplode(col("syms")).as(Seq("sp", "symbol")))
      .join(broadcast(svocab.select(col("symbol"), col("id"))), "symbol")
    val ids = symrows.withColumn("tp",
      row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("wp"), col("sp"))).cast("long") - 1)
    val starts = ids.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("doc_start",
        sum(col("n")).over(Window.partitionBy(col("source"))
          .orderBy(col("doc_id"))) - col("n"))
    ids.join(starts.select(col("doc_id"), col("doc_start")), "doc_id")
      .withColumn("gpos", col("doc_start") + col("tp"))
      .groupBy(col("source"), expr(s"gpos div $windowTokens").as("win"))
      .agg(count(lit(1)).as("n_ids"),
        array_join(transform(
          array_sort(collect_list(struct(col("gpos"), col("id")))),
          s => s.getField("id").cast("string")), ",").as("ids_csv"))
  }

  /** Compressibility proxy — the engine-exact stand-in for the gzip-
    * ratio quality signal (highly compressible ⇒ templated/repetitive
    * text): distinct-to-total 4-gram ratio in ppm, integer division.
    * Narrow per-row computation on the codegen n-gram kernel, zero
    * shuffle; gate on low ppm to drop boilerplate-heavy docs.
    */
  def compressibility(df: DataFrame, n: Int = 4,
                      textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
        split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"),
        graft.functions.TextFunctions.ngrams_join(col("t"), n).as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .withColumn("distinct_ppm", expr("n_distinct * 1000000 div n_grams"))

  /** RAKE keyword extraction (Rose et al. 2010) — PHRASE-level keywords
    * where TF-IDF ranks single terms: candidate phrases are maximal
    * stopword-free token runs; a word's score is `deg/freq` (degree =
    * Σ of the lengths of its phrases — self-inclusive co-occurrence,
    * the common variant); a phrase scores the sum over its word
    * OCCURRENCES. All per-document, integer milli fixed point
    * (`1000·deg div freq` — positive truncating division, engine-
    * exact); ties rank by phrase text then position.
    *
    * Scale shape: phrase building mirrors [[Dedup.cdcChunkDedup]]'s
    * boundary arrays (per-doc, bounded by doc length); the stats are
    * (doc, word)-keyed partial aggs; top-k is one per-doc window.
    */
  def rakeKeywords(df: DataFrame, k: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopArr = "array('the', 'a')" // stopwordCount's fixed list
    val toks = df.select(col(idCol), split(col(textCol), " ").as("t"))
    val tokRows = toks
      .withColumn("bs", expr(
        s"filter(transform(sequence(0, size(t) - 1), i -> " +
          s"IF(array_contains($stopArr, element_at(t, i + 1)), i, -1)), p -> p >= 0)"))
      .select(col(idCol), col("bs"), posexplode(col("t")).as(Seq("pos", "tok")))
      .filter(!expr(s"array_contains($stopArr, tok)"))
      .withColumn("phrase_id", expr("size(filter(bs, p -> p < pos))"))
    val phrases = tokRows.groupBy(col(idCol), col("phrase_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    val wordRows = phrases.select(col(idCol), col("phrase_id"), col("phrase"),
      col("plen"), explode(split(col("phrase"), " ")).as("word"))
    val wstats = wordRows.groupBy(col(idCol), col("word"))
      .agg(sum(col("plen")).as("deg"), count(lit(1)).as("freq"))
      .withColumn("wscore_milli", expr("(1000 * deg) div freq"))
    val scored = wordRows
      .join(wstats, Seq(idCol, "word"))
      .groupBy(col(idCol), col("phrase_id"), col("phrase"))
      .agg(sum(col("wscore_milli")).as("score_milli"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score_milli").desc, col("phrase"), col("phrase_id"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("phrase"), col("score_milli"))
  }

  /** CCNet-style corpus-wide boilerplate REMOVAL (Wenzek et al. 2019
    * dedup paragraphs step, adapted to fixed `width`-token chunks —
    * this corpus has no paragraph breaks): a chunk that appears verbatim
    * in ≥ `maxDf` documents is template/navigation boilerplate and is
    * cut from every document; the survivors are reassembled in original
    * order. Differs from [[boilerplateScore]] (which only SCORES docs)
    * and from `Dedup.substringSpans` (pairwise near-dup spans): this is
    * the frequency-threshold rewrite every CommonCrawl pipeline runs.
    *
    * Scale shape: chunking is a per-row HOF (sequence→slice→join — zero
    * shuffle, no token-level explode); then ONE aggregate for chunk df
    * (partial agg absorbs viral chunks map-side — never a window over
    * the chunk partition), one chunk-keyed join back, one groupBy(doc)
    * reassembly. Three keyed shuffles total, each on a bounded key.
    * Deduplication is by exact chunk text; docs that end up empty are
    * kept with clean_text = '' (the caller decides to drop).
    */
  def boilerplateRemove(df: DataFrame, width: Int = 8, maxDf: Int = 3,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(width >= 1, s"boilerplateRemove: width must be >= 1, got $width")
    require(maxDf >= 2, s"boilerplateRemove: maxDf must be >= 2, got $maxDf")
    val chunked = df.select(col(idCol),
        expr(s"transform(sequence(0, (size(split($textCol, ' ')) - 1) div $width), " +
          s"i -> array_join(slice(split($textCol, ' '), i * $width + 1, $width), ' '))")
          .as("chunks"))
      .select(col(idCol), posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
    // chunk df as an unordered window count: ONE pass over the chunked
    // corpus and one shuffle on the chunk key — the groupBy + join-back
    // form scanned and chunked the corpus twice and shuffled it twice
    val kept = chunked.withColumn("chunk_df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("chunk"))))
    kept.groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(
            when(col("chunk_df") < maxDf, struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_df") >= maxDf, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Topic-cluster report (the BERTopic recipe on engine-exact parts:
    * embed → cluster → c-TF-IDF class terms): documents are hash-embedded
    * ([[hashEmbedding]], map-only), k-means-clustered
    * ([[graft.ops.Similarity.kmeansCentroids]] exact fixed-point Lloyd +
    * the zero-Exchange broadcast argmax), and each topic is labeled with
    * its top-`topTerms` discriminative terms by fixed-point c-TF-IDF:
    * `score_fp = (ctf·10⁶ div topic_tokens) · (nTopics div topic_df)` —
    * term share within the topic × the linear-idf surrogate over
    * topic-level df (the same integer-exactness trade as tfidfTopK,
    * documented; log-idf is not engine-replicable).
    *
    * Scale shape: embedding is map-only; Lloyd rounds cost k·dim tiny
    * aggregate rows per round; term scoring is two keyed aggregates
    * (topic×term, term) and a topic-sized window over candidates. The
    * report is topics×topTerms rows — dashboard-sized.
    */
  def topicClusters(df: DataFrame, nTopics: Int = 8, iters: Int = 2,
                    dim: Int = 64, topTerms: Int = 3,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = hashEmbedding(df, dim = dim, textCol = textCol)
    val centroids = graft.ops.Similarity.kmeansCentroids(emb, nTopics, iters)
    val asg = graft.ops.Similarity.ivfAssignWith(emb, centroids)
      .select(col("vec_id").as(idCol), col("centroid_id").as("topic_id"))
    val sizes = asg.groupBy(col("topic_id")).agg(count(lit(1)).as("n_docs"))
    val terms = df.join(asg, idCol)
      .select(col("topic_id"), explode(split(col(textCol), " ")).as("term"))
    val ctf = terms.groupBy(col("topic_id"), col("term"))
      .agg(count(lit(1)).as("ctf"))
    val topicTokens = terms.groupBy(col("topic_id")).agg(count(lit(1)).as("topic_tokens"))
    val termTopics = ctf.groupBy(col("term")).agg(count(lit(1)).as("topic_df"))
    // topicTokens and sizes are nTopics rows — broadcast, never SMJ;
    // termTopics is vocab-sized and stays a keyed shuffle join
    val scored = ctf.join(broadcast(topicTokens), "topic_id").join(termTopics, "term")
      .withColumn("score_fp",
        expr(s"(ctf * 1000000 div topic_tokens) * ($nTopics div topic_df)"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("topic_id"))
        .orderBy(col("score_fp").desc, col("term"))))
      .filter(col("rank") <= topTerms)
      .join(broadcast(sizes), "topic_id")
      .select(col("topic_id"), col("n_docs"), col("rank"), col("term"), col("score_fp"))
  }

  /** Cluster-purity eval for [[topicClusters]]' assignment: per topic,
    * the dominant external label (here `lang`) and its share — the
    * standard external-validity check before a clustering drives
    * mixing/splitting decisions (purity ≈ 1 means topics align with the
    * label; ≈ 1/|labels| means the embedding carries none of it).
    * Ties break to the lexicographically largest label (max_by on the
    * (n, label) pair — deterministic, oracle-replicable). Same
    * fit/assign path as topicClusters; the purity tail is two keyed
    * partial aggs over (topic, label) counts — topics×labels rows.
    */
  def topicPurity(df: DataFrame, nTopics: Int = 8, iters: Int = 2,
                  dim: Int = 64, labelCol: String = "lang"): DataFrame = {
    val emb = hashEmbedding(df, dim = dim)
    val centroids = graft.ops.Similarity.kmeansCentroids(emb, nTopics, iters)
    val asg = graft.ops.Similarity.ivfAssignWith(emb, centroids)
      .select(col("vec_id").as("doc_id"), col("centroid_id").as("topic_id"))
    val byLabel = df.select(col("doc_id"), col(labelCol).as("lang"))
      .join(asg, "doc_id")
      .groupBy(col("topic_id"), col("lang")).agg(count(lit(1)).as("n"))
    byLabel.groupBy(col("topic_id"))
      .agg(sum(col("n")).as("n_docs"),
        max_by(struct(col("n"), col("lang")),
          struct(col("n"), col("lang"))).as("__top"))
      .select(col("topic_id"), col("n_docs"),
        col("__top.lang").as("top_lang"), col("__top.n").as("n_top"),
        expr("(n_top * 1000000) div n_docs").as("purity_ppm"))
  }

  /** Blocklist hit counting — the safety-filter primitive: per document,
    * total occurrence count of any blocklist term plus the count of
    * distinct terms present. SUBSTRING semantics (an occurrence is
    * counted wherever the term appears, word-boundary or not) — exact,
    * engine-replicable via the replace-length identity
    * `(len(t) - len(replace(t, term))) / len(term)`, and the documented
    * trade: boundary-aware matching needs per-term regexes that RE2 and
    * Java disagree on for edge classes. Terms fold into a fixed
    * expression chain (the list is config-sized, ≤ a few thousand — it
    * compiles into the plan, zero shuffle, no join).
    */
  def blocklistHits(text: Column, terms: Seq[String]): (Column, Column) = {
    require(terms.nonEmpty && terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
    val counts = terms.map { t =>
      // numerator is always an exact multiple of the term length, so the
      // division is exact; cast pins the integer dtype per term
      ((length(text) - length(replace(text, lit(t), lit("")))) / t.length).cast("long")
    }
    val total = counts.reduce(_ + _)
    val distinctHit = counts.map(c => when(c > 0, 1L).otherwise(0L)).reduce(_ + _)
    (total, distinctHit)
  }

  /** Soft-watermark detection statistic (Kirchenbauer et al. 2023 — the
    * public "green list" LLM watermark): a watermarked generator biases
    * each token toward a pseudorandom γ-fraction of the vocabulary
    * seeded by the PREVIOUS token; the detector recounts green tokens
    * and z-tests the excess over the γ·T chance rate. The pipeline
    * reading: flag machine-generated (watermarked) text before it
    * contaminates a training corpus. Model-free replication: green(prev,
    * tok) ⇔ `(h(prev) + h(tok)) mod 4 = 0` with h = FNV-64a mod 2³¹−1
    * (γ = 1/4) — the same engine-neutral hash discipline as MinHash, so
    * the whole statistic is oracle-verifiable. `z_milli` uses the
    * paper's one-proportion z in fixed-order doubles (sqrt only);
    * `watermarked` applies the paper's z ≥ 4 detection threshold. Docs
    * with < 2 tokens report 0 pairs and never flag.
    *
    * Scale shape: one window shuffle on doc_id for the lag pairing,
    * then a per-doc partial agg; everything else is codegen'd hashing.
    */
  def watermarkDetect(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = 2147483647L
    val toks = docs.select(col("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("h", pmod(graft.functions.FnvHash64.fnv_hash64(col("tok")), lit(P)))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val paired = toks
      .withColumn("prev_h", lag(col("h"), 1).over(w))
      .filter(col("prev_h").isNotNull)
    val agg = paired.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(pmod(col("prev_h") + col("h"), lit(4L)) === 0L, 1L)
          .otherwise(0L)).as("n_green"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_green"), lit(0L)).as("n_green"))
      .withColumn("z_milli", expr(
        """CASE WHEN n_pairs > 0 THEN
          |  CAST(FLOOR((CAST(n_green AS DOUBLE) - CAST(n_pairs AS DOUBLE) / 4.0)
          |              / SQRT(3.0 * CAST(n_pairs AS DOUBLE) / 16.0)
          |              * 1000.0 + 0.5) AS BIGINT)
          |END""".stripMargin))
      .withColumn("watermarked",
        coalesce(col("z_milli") >= 4000L, lit(false)))
  }

  /** BLEU-style n-gram precision between candidate/reference document
    * pairs (Papineni et al. 2002 — the machine-generated-data QA
    * metric: score synthetic rewrites against their sources before they
    * enter a training mix). Pairing convention here: odd `doc_id` is
    * the candidate, `doc_id − 1` its reference; only complete pairs
    * report. Per pair and n ∈ 1..maxN: CLIPPED modified precision
    * `Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_cand(g)` in ppm by
    * integer division, NULL where the candidate has no n-grams of that
    * order. The brevity penalty is exposed as its exact integer parts
    * (`len_c`, `len_r`, `bp_ok = len_c ≥ len_r`) — `exp(1 − r/c)` is a
    * transcendental no two engines round identically, so the composed
    * BLEU stays caller-side (the geometric mean needs `exp`/`ln` too).
    *
    * Scale shape: all four n-gram orders come from ONE pass per side
    * (per-row HOF building tagged grams, then a single explode), and
    * every join/agg is keyed by (pair_id, gram) or (pair_id, n) —
    * pair-local, partial-agg-friendly, no corpus-wide stage. Clipping
    * joins candidate counts to reference counts with an equi-join whose
    * width is the pair's own vocabulary.
    */
  def bleuPairs(docs: DataFrame, maxN: Int = 4,
                textCol: String = "text"): DataFrame = {
    require(maxN >= 1 && maxN <= 5, s"bleuPairs: maxN=$maxN out of range")
    val toks = docs.select(col("doc_id"), split(col(textCol), " ").as("t"))
    val cand = toks.filter(col("doc_id") % 2 === 1)
      .select((col("doc_id") - 1).as("pair_id"), col("t"))
    val ref = toks.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("pair_id"), col("t"))

    // one scan per side: every order's grams, tagged "n|gram" (tokens
    // never contain spaces post-split, and the n prefix disambiguates
    // orders even if a token contains '|' — split_part reads OUR field)
    def gramCounts(side: DataFrame): DataFrame = {
      val tagged = (1 to maxN).map {
        case 1 => transform(col("t"), x => concat(lit("1|"), x))
        case n => transform(ngrams(col("t"), n), g => concat(lit(s"$n|"), g))
      }
      side.select(col("pair_id"),
          explode(flatten(array(tagged: _*))).as("g"))
        .groupBy(col("pair_id"), col("g"))
        .agg(count(lit(1)).as("c"))
    }
    val cc = gramCounts(cand)
    val rc = gramCounts(ref).withColumnRenamed("c", "rc")

    val nOf = expr("CAST(split_part(g, '|', 1) AS INT)")
    val tot = cc.withColumn("n", nOf)
      .groupBy(col("pair_id"), col("n")).agg(sum(col("c")).as("total"))
    val clip = cc.join(rc, Seq("pair_id", "g"))
      .withColumn("n", nOf)
      .groupBy(col("pair_id"), col("n"))
      .agg(sum(least(col("c"), col("rc"))).as("clipped"))
    val prec = tot.join(clip, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("n"),
        expr("(coalesce(clipped, 0L) * 1000000) div total").as("p_ppm"))

    val lens = cand.select(col("pair_id"), size(col("t")).cast("long").as("len_c"))
      .join(ref.select(col("pair_id"), size(col("t")).cast("long").as("len_r")),
        Seq("pair_id"))
    val pCols = (1 to maxN).map(n =>
      max(when(col("n") === n, col("p_ppm"))).as(s"p${n}_ppm"))
    val wide = prec.groupBy(col("pair_id")).agg(pCols.head, pCols.tail: _*)
    lens.join(wide, Seq("pair_id"), "left")
      .select(Seq(col("pair_id"), col("len_c"), col("len_r"),
        (col("len_c") >= col("len_r")).as("bp_ok")) ++
        (1 to maxN).map(n => col(s"p${n}_ppm")): _*)
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * n-grams whose corpus-wide first occurrence is this doc — the
    * cheap memorization/recency proxy curation pipelines use to rank
    * "how much new text does this doc add" (low novelty ≈ boilerplate
    * or near-copy of earlier corpus mass; the doc-id order stands in
    * for ingestion order). Same first-occurrence trick as the Heaps
    * curve, at n-gram granularity: one linear groupBy on the shingle
    * (map-side combinable min), one equi-join back — no window over a
    * data-sized partition, no per-doc distinct scans. Docs shorter than
    * n tokens carry zero grams and a NULL ratio.
    */
  def ngramNovelty(df: DataFrame, n: Int = 3, idCol: String = "doc_id"): DataFrame = {
    val sh = Dedup.shingles(df, n, idCol = idCol)
    val firstDoc = sh.groupBy(col("shingle"))
      .agg(min(col(idCol)).as("first_doc"))
    val per = sh.join(firstDoc, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ppm",
        expr("CASE WHEN n_grams > 0 THEN (n_novel * 1000000) div n_grams END"))
  }
}
