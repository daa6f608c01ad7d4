package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping sampling operators: the per-domain caps and
  * quantile gates every web-scale training-data pipeline applies
  * between dedup and mixing (RefinedWeb per-domain caps, C4/CCNet
  * quality-bucket selection). The stratified keep-hash sampler and the
  * data-dependent curriculum mixer live in SparkEntry/TextAnalysis;
  * these are their rank-based complements — data-dependent within a
  * group rather than rate-based.
  *
  * Scale stance: each operator is ONE shuffle on the group key with a
  * window rank — no global sort, no driver-side state. A group holding
  * a dominant share of the corpus (one mega-domain) serializes its
  * window partition; the standard two-phase remedy (pre-aggregate a
  * per-group count, then rank within salted sub-groups and re-rank the
  * boundary) applies, but the single-window form is the right default
  * because group cardinality in practice (domains, sources, langs) is
  * millions of small groups, not one giant one.
  */
object Sampling {

  /** Per-group frequency cap: keep at most `n` rows per group, best
    * ranked first (RefinedWeb §3.2 caps documents per registered
    * domain; C4 caps per-host). `order` decides which survive — pass
    * deterministic total orders (end with the id column) so reruns and
    * engines agree.
    */
  def capPerGroup(df: DataFrame, groupCol: String, n: Int,
                  order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Per-group top-percent quantile gate: keep the best `pct` percent
    * of each group by rank (quality-score gating à la CCNet's
    * perplexity buckets, kept integer-exact for cross-engine parity:
    * `rank*100 <= pct*group_count` instead of a float percentile).
    * Both the rank and the count ride the SAME window partition — one
    * shuffle, two window functions, no join-back. Every group keeps at
    * least its top-1 row only when pct*count >= 100; tiny groups can
    * drop entirely (matching the integer inequality, documented).
    */
  def topPercentPerGroup(df: DataFrame, groupCol: String, pct: Int,
                         order: Seq[Column]): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct out of [0,100]")
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("__rk", row_number().over(w.orderBy(order: _*)))
      .withColumn("__n", count(lit(1)).over(w))
      // rk is IntegerType — widen before scaling or a >21.4M-row group
      // (exactly the mega-domain case) overflows i32 at rk*100
      .filter(col("__rk").cast("long") * 100 <= col("__n") * pct)
      .drop("__rk", "__n")
  }

  /** Temperature-weighted mixing table at T = 2 (the mT5/multilingual
    * standard: sample sources ∝ n^(1/T), upweighting the tail): weights
    * are `floor(sqrt(n))` — IEEE sqrt is correctly rounded and n < 2⁵²
    * is double-exact, so the weight is bit-identical on any engine —
    * and the per-source keep rate in ppm is the DEFINED nested-floor
    * form `min(10⁶, ((budget·10⁶ div Σw) · w) div n)`, every step a
    * long (a single exact big-rational floor would need 128-bit
    * arithmetic; the nested form is the documented contract both
    * engines replicate). One tiny groupBy + one broadcast single-row
    * total. T ≠ 2 needs pow — outside the integer-exact subset.
    *
    * Degenerate sources get an explicit 0 rate: a source whose tokens
    * sum to 0/NULL (or an all-empty corpus, Σw = 0) must keep NOTHING —
    * without the guard the integer `div` yields NULL and `least()`
    * skips NULLs, silently promoting the rate to the 10⁶ cap.
    */
  def temperatureMixRates(df: DataFrame, budget: Long,
                          groupCol: String = "source",
                          weightCol: String = "n_chars"): DataFrame = {
    require(budget >= 0, s"temperatureMix: budget=$budget must be >= 0")
    require(budget <= Long.MaxValue / 1000000L,
      s"temperatureMix: budget=$budget overflows the ppm scaling — use coarser units")
    val sizes = df.groupBy(col(groupCol))
      .agg(coalesce(sum(col(weightCol)).cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("weight", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = sizes.agg(sum(col("weight")).as("__w_sum"))
    sizes.crossJoin(broadcast(totals))
      .select(col(groupCol), col("n_tokens"), col("weight"),
        when(col("n_tokens") <= 0 || col("__w_sum") <= 0, lit(0L))
          .otherwise(least(lit(1000000L),
            expr(s"((${budget}L * 1000000L div __w_sum) * weight) div n_tokens")))
          .as("rate_ppm"))
  }

  /** UniMax budget allocation (Chung et al. 2023 §3, published method):
    * distribute a token `budget` over sources as UNIFORMLY as possible
    * while never taking more than `epochCap` epochs of any source —
    * small sources saturate at cap `n_i·E`, everyone else splits the
    * remainder evenly. Closed form over the cap-sorted sources:
    * source k saturates iff `cap_k · remaining_k ≤ B − Σ_{j<k} cap_j`
    * (the saturated set is a prefix of the ascending order — standard
    * waterfilling), and the uniform level for the rest is
    * `u = (B − Σ_sat) div n_unsat` (integer floor: the budget is a
    * ceiling, never overshot).
    *
    * Everything is integer-exact: one groupBy for sizes, window
    * cumsums over |sources| rows (tiny — domains/languages, not
    * documents), one broadcast single-row aggregate for the saturated
    * totals. Output per source: corpus tokens, cap, allocated tokens,
    * and milli-epochs (`alloc·1000 div n`), the mixing table a training
    * loader consumes.
    *
    * Overflow posture: Spark's non-ANSI `*` wraps silently, and a
    * wrapped-negative cap would sort first, "saturate", and emit a
    * negative allocation. Guarded by an eager single-row aggregate over
    * the tiny per-source table (the documented bloom-sizing stance):
    * every product in the plan — `n·epochCap`, `cap·remaining`,
    * `alloc·1000` — is proven in-range or the call fails loudly.
    */

  /** Quality-first token-budget waterfall — the third mixing recipe
    * next to UniMax (uniformity) and temperature (tail smoothing): fill
    * the budget from the highest-priority source downward, taking each
    * source up to its epoch cap (`n·epochCapTenths/10` tokens) until
    * the budget runs out — the "spend scarce budget on the best data
    * first" selection used when a quality signal (here any per-source
    * priority column) is trusted more than diversity. Pure integer
    * arithmetic: the greedy is a cumulative-sum window over the
    * |sources|-row stats table (group-count-sized, never the corpus),
    * `take = clamp(budget − cum_before, 0, cap)`.
    */
  def qualityBudgetMix(stats: DataFrame, budget: Long,
                       epochCapTenths: Int = 20): DataFrame = {
    require(budget >= 0 && epochCapTenths > 0,
      s"qualityBudgetMix: bad budget=$budget epochCapTenths=$epochCapTenths")
    val w = Window.orderBy(col("priority").desc, col("source"))
    stats.select(col("source"), col("n_tokens"), col("priority"))
      .withColumn("cap_tokens", expr(s"(n_tokens * $epochCapTenths) div 10"))
      .withColumn("__cum_before",
        coalesce(sum(col("cap_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("take_tokens",
        greatest(lit(0L), least(col("cap_tokens"),
          lit(budget) - col("__cum_before"))))
      .withColumn("epochs_milli", expr(
        "CASE WHEN n_tokens > 0 THEN (take_tokens * 1000) div n_tokens ELSE 0 END"))
      .drop("__cum_before")
  }

  /** Neyman (optimal) stratified-sample allocation vs proportional —
    * classical sampling theory (Neyman 1934): with a fixed total budget
    * `k`, sampling stratum h at `n_h·σ_h / Σ n·σ` minimizes the
    * estimator variance — high-variance sources deserve MORE than their
    * proportional share, uniform boilerplate sources less. σ here is
    * the per-source doc-length sd, the cheap universal spread proxy
    * (swap in any per-doc score's sums for a targeted allocation).
    *
    * Determinism discipline: σ floors to integer MILLI first, so the
    * weights `n_h·σ_milli` are BIGINT and every share divides exactly —
    * a double Σw would make allocations hostage to partial-agg addition
    * order. Seats apportion by LARGEST REMAINDER (floor shares, then
    * the `k − Σfloor` leftovers go to the biggest `(k·w) mod Σw`, ties
    * to the smaller source name), so Σalloc = k exactly. All windows
    * run over the |sources|-row aggregate.
    */
  def neymanAllocation(docs: DataFrame, k: Long,
                       groupCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    require(k >= 0 && k <= 1000000L,
      s"neymanAllocation: k=$k outside the supported budget range; " +
        "the k·w ≤ 2⁶³−1 contract itself is enforced data-side in apportion")
    val per = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("__sx"),
        sum(size(split(col(textCol), " ")).cast("long")
          * size(split(col(textCol), " ")).cast("long")).as("__sx2"))
      .withColumn("sd_milli", expr(
        // population sd from exact sums, sqrt-only fixed-order doubles;
        // the ≤ 0 guard absorbs the constant-stratum rounding denormal
        """CASE WHEN CAST(__sx2 AS DOUBLE) / CAST(n_docs AS DOUBLE)
          |       - (CAST(__sx AS DOUBLE) / CAST(n_docs AS DOUBLE))
          |         * (CAST(__sx AS DOUBLE) / CAST(n_docs AS DOUBLE)) <= 0.0
          |  THEN CAST(0 AS BIGINT)
          |  ELSE CAST(FLOOR(SQRT(
          |    CAST(__sx2 AS DOUBLE) / CAST(n_docs AS DOUBLE)
          |      - (CAST(__sx AS DOUBLE) / CAST(n_docs AS DOUBLE))
          |        * (CAST(__sx AS DOUBLE) / CAST(n_docs AS DOUBLE)))
          |    * 1000.0 + 0.5) AS BIGINT) END""".stripMargin))
      .drop("__sx", "__sx2")
    def apportion(weightExpr: String, out: String): DataFrame => DataFrame = df => {
      val w = Window.orderBy(col("__r").desc, col(groupCol))
      // DATA-SIDE overflow audit (the `k ≤ 1e6` require only bounds one
      // factor): w = n_docs·sd_milli is unbounded, and `k·w` below runs
      // under non-ANSI arithmetic where a wrap is silent garbage, not an
      // error. Fail loudly instead: every per-stratum weight and the
      // grand total must satisfy k·w ≤ 2⁶³−1, and a wrapped Σw (which
      // can only show up as negative or smaller than a member under
      // same-sign addends) is rejected the same way. The guard lives
      // INSIDE the __w/__tw expressions so Catalyst cannot prune it.
      val kCap = Long.MaxValue / math.max(k, 1L)
      df.withColumn("__w", expr(
          s"""CASE WHEN ($weightExpr) BETWEEN 0 AND $kCap
             |  THEN CAST(($weightExpr) AS BIGINT)
             |  ELSE CAST(assert_true(false,
             |    'neymanAllocation: stratum weight outside [0, (2^63-1)/k] — k*w would overflow') AS BIGINT)
             |END""".stripMargin))
        .withColumn("__stw", sum(col("__w")).over(Window.partitionBy()))
        .withColumn("__tw", expr(
          s"""CASE WHEN __stw BETWEEN __w AND $kCap THEN __stw
             |  ELSE CAST(assert_true(false,
             |    'neymanAllocation: total weight outside [w, (2^63-1)/k] — k*sum(w) would overflow') AS BIGINT)
             |END""".stripMargin))
        .withColumn("__base",
          expr(s"CASE WHEN __tw > 0 THEN ($k * __w) div __tw ELSE 0L END"))
        .withColumn("__r",
          expr(s"CASE WHEN __tw > 0 THEN ($k * __w) % __tw ELSE 0L END"))
        .withColumn("__sumbase", sum(col("__base")).over(Window.partitionBy()))
        .withColumn("__left",
          expr(s"CASE WHEN __tw > 0 THEN $k - __sumbase ELSE 0L END"))
        .withColumn(out,
          col("__base") + when(row_number().over(w) <= col("__left"), 1L)
            .otherwise(0L))
        .drop("__w", "__stw", "__tw", "__base", "__r", "__sumbase", "__left")
    }
    val neyman = apportion("n_docs * sd_milli", "alloc_neyman")
    val prop = apportion("n_docs", "alloc_prop")
    prop(neyman(per))
      .select(col(groupCol), col("n_docs"), col("sd_milli"),
        col("alloc_neyman"), col("alloc_prop"))
  }

  /** Greedy token-budget shard assignment — THE shard math (`pack_shards`
    * and [[packConcat]] must agree on which docs share a shard, so they
    * share this): per-group id-ordered token cumsum, shard = floor of
    * the doc's start position over the budget. One window shuffle on
    * the group key, never a global sort. Output adds `__nt` (token
    * count) and `shard` to (group, id, text) columns.
    */
  def shardAssign(df: DataFrame, budgetTokens: Int,
                  groupCol: String = "source", textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, s"shardAssign: budgetTokens=$budgetTokens must be > 0")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.select(col(groupCol), col(idCol), col(textCol).as("__t"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .withColumn("__start", sum(col("__nt")).over(w) - col("__nt"))
      .withColumn("shard", expr(s"__start div $budgetTokens"))
      .drop("__start")
  }

  /** Materialize packed training shards: the step AFTER [[shardAssign]]
    * that a training loader actually consumes — per (group, shard) the
    * EOS-joined text blob in id order plus the BYTE offset of every
    * document start (`offsets_csv`), so a reader can slice any document
    * straight out of the UTF-8 shard file without re-tokenizing.
    * Offsets are exact UTF-8 byte positions (Σ previous
    * `octet_length(text) + octet_length(eos)`) — bytes, not chars or
    * UTF-16 units, because bytes are what a file reader seeks by.
    *
    * Scale shape: one window partitioning (group, then group+shard —
    * the group+shard distribution is already satisfied by the group
    * hash, no second exchange) and a groupBy whose state per key is ONE
    * shard's text (bounded by the token budget, not the corpus); the
    * per-shard sort is a single combined (id, text, off) struct list.
    */
  def packConcat(df: DataFrame, budgetTokens: Int, eos: String = "<|eos|>",
                 groupCol: String = "source", textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val packed = shardAssign(df, budgetTokens, groupCol, textCol, idCol)
    val ws = Window.partitionBy(col(groupCol), col("shard")).orderBy(col(idCol))
    val eosBytes = eos.getBytes("UTF-8").length.toLong
    packed
      .withColumn("__off", coalesce(
        sum(octet_length(col("__t")).cast("long") + lit(eosBytes))
          .over(ws.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col(groupCol), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("shard_tokens"),
        array_sort(collect_list(struct(col(idCol), col("__t"), col("__off"))))
          .as("__docs"))
      .select(col(groupCol), col("shard"), col("n_docs"), col("shard_tokens"),
        array_join(transform(col("__docs"), s => s.getField("__t")), eos).as("blob"),
        array_join(transform(col("__docs"),
          s => s.getField("__off").cast("string")), ",").as("offsets_csv"))
  }

  /** Shard MANIFEST — the integrity artifact a training loader checks
    * before reading a shard (WebDataset-style sidecar): per (group,
    * shard) the blob's byte size, SHA-256, doc count and token mass.
    * Derived from [[packConcat]]'s blobs, so manifest ≡ artifact by
    * construction; a re-download or partial write shows up as a hash
    * mismatch. Narrow projection over the packed frame.
    */
  def packManifest(df: DataFrame, budgetTokens: Int, eos: String = "<|eos|>",
                   groupCol: String = "source", textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    packConcat(df, budgetTokens, eos, groupCol, textCol, idCol)
      .select(col(groupCol), col("shard"), col("n_docs"), col("shard_tokens"),
        octet_length(col("blob")).cast("long").as("blob_bytes"),
        sha2(col("blob"), 256).as("sha256"))

  /** Token-level context-window packing — the concat-and-chop every LM
    * pretraining loader runs: per group, documents are concatenated in
    * id order into one token stream and chopped into fixed `windowTokens`
    * context windows; a document crossing a boundary is SPLIT, its tail
    * continuing in the next window (no padding waste, unlike the
    * doc-granular [[shardAssign]], which never splits). Output is the
    * loader manifest: one row per (window, document-slice) with
    *  - `win`       window id within the group,
    *  - `doc_from`  first token of the slice, as an offset INTO THE DOC,
    *  - `slice_len` tokens in the slice,
    *  - `win_off`   where the slice lands INSIDE the window —
    * enough to materialize any window without touching neighbors, and
    * the attention-mask boundaries fall out of consecutive rows.
    *
    * Scale shape: one window shuffle on the group key for the running
    * token offset, then a narrow per-row explode over the (tiny — a doc
    * spans `⌈len/W⌉` windows) window-id range. Integer-exact, no RNG,
    * no global sort. Every window except each group's last holds
    * exactly `windowTokens` tokens (spec-asserted).
    */
  def packSequences(df: DataFrame, windowTokens: Int,
                    groupCol: String = "source", textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(windowTokens > 0,
      s"packSequences: windowTokens=$windowTokens must be > 0")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.select(col(groupCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .filter(col("__nt") > 0)
      .withColumn("__start", sum(col("__nt")).over(w) - col("__nt"))
      .withColumn("__end", col("__start") + col("__nt"))
      .withColumn("win", explode(sequence(
        expr(s"__start div $windowTokens"),
        expr(s"(__end - 1) div $windowTokens"))))
      .select(col(groupCol), col("win"), col(idCol),
        (greatest(col("__start"), col("win") * windowTokens) - col("__start"))
          .as("doc_from"),
        (least(col("__end"), (col("win") + 1) * windowTokens)
          - greatest(col("__start"), col("win") * windowTokens)).as("slice_len"),
        (greatest(col("__start"), col("win") * windowTokens)
          - col("win") * windowTokens).as("win_off"))
  }

  /** Packing-efficiency report: for every candidate context-window
    * size, the sequence count, padding waste, and truncation loss each
    * loader strategy would pay on THIS corpus — the numbers a pipeline
    * owner reads before committing a `windowTokens`:
    *
    *  - `pad_doc`: one document per sequence run, padded up to the next
    *    window boundary (no splits, no loss — pure padding waste);
    *  - `clip`: one document per fixed-W sequence, padded short docs,
    *    truncating long ones (BERT-style — waste AND loss);
    *  - `chop`: concat-and-chop per group ([[packSequences]] — waste
    *    only in each group's final window, zero loss).
    *
    * `efficiency_ppm` = content·10⁶ / (sequences·W), integer-exact.
    * Overflow bound: content_tokens × 10⁶ must fit in 64 bits — fine
    * through ~9×10¹² tokens; beyond that, run per-partition reports.
    *
    * Scale shape: one corpus scan computes per-doc token counts; the
    * windows list is a literal explode (|W| ≤ dozens) feeding partial
    * aggregates — map-side combine leaves |W| rows per strategy. The
    * `chop` arm aggregates per group first (bounded by group
    * cardinality), then per window.
    */
  def packingEfficiency(df: DataFrame, windows: Seq[Int],
                        groupCol: String = "source",
                        textCol: String = "text"): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ > 0),
      s"packingEfficiency: windows=$windows must be non-empty positive")
    val nt = df
      .select(col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("nt"))
      .filter(col("nt") > 0)
    val wArr = lit(windows.toArray)
    val perDoc = nt.select(col("nt"), explode(wArr).as("w"))
    val padDoc = perDoc.groupBy(col("w")).agg(
        sum(expr("(nt + w - 1) div w")).as("n_sequences"),
        sum(col("nt")).as("content_tokens"),
        sum(expr("((nt + w - 1) div w) * w - nt")).as("padding_tokens"))
      .withColumn("truncated_tokens", lit(0L))
      .withColumn("strategy", lit("pad_doc"))
    val clip = perDoc.groupBy(col("w")).agg(
        count(lit(1)).as("n_sequences"),
        sum(least(col("nt"), col("w").cast("long"))).as("content_tokens"),
        sum(greatest(lit(0L), col("w") - col("nt"))).as("padding_tokens"),
        sum(greatest(lit(0L), col("nt") - col("w"))).as("truncated_tokens"))
      .withColumn("strategy", lit("clip"))
    val chop = nt.groupBy(col(groupCol)).agg(sum(col("nt")).as("gt"))
      .select(col("gt"), explode(wArr).as("w"))
      .groupBy(col("w")).agg(
        sum(expr("(gt + w - 1) div w")).as("n_sequences"),
        sum(col("gt")).as("content_tokens"),
        sum(expr("((gt + w - 1) div w) * w - gt")).as("padding_tokens"))
      .withColumn("truncated_tokens", lit(0L))
      .withColumn("strategy", lit("chop"))
    val cols = Seq("w", "strategy", "n_sequences", "content_tokens",
      "padding_tokens", "truncated_tokens").map(col)
    padDoc.select(cols: _*)
      .unionByName(clip.select(cols: _*))
      .unionByName(chop.select(cols: _*))
      .select(col("w").cast("long").as("window_tokens"), col("strategy"),
        col("n_sequences"), col("content_tokens"), col("padding_tokens"),
        col("truncated_tokens"),
        expr("content_tokens * 1000000 div (n_sequences * w)").as("efficiency_ppm"))
  }

  /** Deterministic train/val/test assignment, keyed on CONTENT by
    * default: the split hash is FNV-64a of the text (unsigned-mod ppm),
    * so byte-identical duplicates — the ones dedup may not have caught
    * yet — always land in the SAME split and can never leak train
    * examples into eval. Keying on doc_id (pass `byContent = false`)
    * gives id-stable splits instead (re-ingested content moves with its
    * id). Thresholds are ppm (train, then val, remainder test),
    * integer-exact, no RNG — rerunning on any partitioning reproduces
    * the split bit-for-bit, the same keep-hash recipe as
    * [[graft.functions.FnvHash64.keepHashPpm]].
    * Narrow per-row projection; zero shuffles.
    */
  def assignSplits(df: DataFrame, trainPpm: Int = 800000, valPpm: Int = 100000,
                   textCol: String = "text", idCol: String = "doc_id",
                   byContent: Boolean = true): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000,
      s"assignSplits: train=$trainPpm + val=$valPpm ppm exceed 1e6")
    val h =
      if (byContent) graft.functions.FnvHash64.remainderUnsigned(
        graft.functions.FnvHash64.fnv_hash64(col(textCol)), 1000000L)
      else graft.functions.FnvHash64.keepHashPpm(col(idCol))
    df.withColumn("split",
      when(h < trainPpm, "train")
        .when(h < trainPpm + valPpm, "val")
        .otherwise("test"))
  }

  /** Near-dup-aware split assignment: every near-duplicate CLUSTER
    * rides one split — the representative's (min-id member's) content
    * hash keys all members — so the fuzzy leakage `split_leakage`
    * surfaces is structurally impossible, extending [[assignSplits]]'
    * exact-duplicate guarantee to the near-dup graph. `pairs` is any
    * near-dup pair set `(doc_a, doc_b)` (MinHash-LSH in the shipped
    * query).
    *
    * Scale shape: [[Dedup.clusters]] is the min-label/star family
    * (log-round shuffles over the PAIR graph only — near-dups are a
    * small corpus fraction); the representative-text key is two
    * broadcast-sized joins on `cluster_id`; singleton documents never
    * shuffle at all (left joins miss, content key falls back to their
    * own text).
    */
  def assignSplitsByCluster(df: DataFrame, pairs: DataFrame,
                            trainPpm: Int = 800000, valPpm: Int = 100000,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val labels = Dedup.clusters(pairs)
    val reps = df.select(col(idCol).as("cluster_id"), col(textCol).as("__rep_text"))
      .join(labels.filter(col("doc_id") === col("cluster_id"))
        .select(col("cluster_id")), "cluster_id")
    val keyed = df
      .join(labels.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .join(reps, Seq("cluster_id"), "left")
      .withColumn("__key_text", coalesce(col("__rep_text"), col(textCol)))
    assignSplits(keyed, trainPpm, valPpm, textCol = "__key_text", idCol = idCol)
      .drop("__rep_text", "__key_text")
  }

  /** Weighted sampling without replacement — priority sampling
    * (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    * q = w/u with u uniform on (0,1], and the k largest priorities are
    * the sample. Instantiated DETERMINISTICALLY and integer-exactly:
    * u = (keepHashPpm(id)+1)/10⁶, so q = w·10⁶ div (h+1) — no RNG,
    * bit-identical on any engine/partitioning, heavier rows win more
    * buckets of the hash lottery exactly as the published scheme
    * prescribes. Selection is orderBy+limit → TakeOrderedAndProject
    * (per-partition top-k, merge of k·P rows — never a global sort).
    * Overflow contract: w·10⁶ must fit in 64 bits (w < 9.2·10¹²) —
    * token/char weights are far inside; fail-loud guard on the cheap
    * single-row max.
    */
  def prioritySample(df: DataFrame, k: Int, weightCol: String,
                     idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"prioritySample: k=$k must be >= 1")
    val maxW = df.agg(coalesce(max(col(weightCol)).cast("long"), lit(0L))).head.getLong(0)
    require(maxW <= Long.MaxValue / 1000000L,
      s"prioritySample: max weight $maxW overflows the ppm priority — use coarser units")
    val h = graft.functions.FnvHash64.keepHashPpm(col(idCol))
    // integer `div`, never float `/`: the truncated quotient is the
    // defined priority, and float rounding near .0 boundaries would
    // flip ranks between engines
    df.withColumn("__u", h + 1)
      .withColumn("priority",
        expr(s"(CAST($weightCol AS BIGINT) * 1000000L) div __u"))
      .drop("__u")
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  def unimaxAllocation(df: DataFrame, budget: Long, epochCap: Int = 4,
                       groupCol: String = "source",
                       weightCol: String = "n_chars"): DataFrame = {
    require(budget >= 0 && epochCap >= 1,
      s"unimax: budget=$budget epochCap=$epochCap out of range")
    require(budget <= Long.MaxValue / 1000L,
      s"unimax: budget=$budget overflows the milli-epoch scaling — use coarser units")
    val sizes = df.groupBy(col(groupCol))
      .agg(coalesce(sum(col(weightCol)).cast("long"), lit(0L)).as("n_tokens"))
    val bounds = sizes.agg(coalesce(max(col("n_tokens")), lit(0L)),
      count(lit(1))).head
    val (maxN, nSources) = (bounds.getLong(0), bounds.getLong(1))
    require(maxN >= 0, s"unimax: negative $weightCol sum ($maxN) in some source")
    require(maxN <= Long.MaxValue / epochCap &&
      (nSources == 0 || maxN * epochCap <= Long.MaxValue / math.max(nSources, 1000L)),
      s"unimax: max source size $maxN × epochCap=$epochCap × $nSources sources " +
        s"overflows 64-bit token arithmetic — use coarser units")
    val withCap = sizes.withColumn("cap_tokens", col("n_tokens") * epochCap)
    val ord = Window.orderBy(col("cap_tokens"), col(groupCol))
    val flagged = withCap
      .withColumn("__prefix", coalesce(sum(col("cap_tokens"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__remaining",
        count(lit(1)).over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__sat",
        col("cap_tokens") * col("__remaining") <= lit(budget) - col("__prefix"))
    val totals = flagged.agg(
      sum(when(col("__sat"), col("cap_tokens")).otherwise(0L)).as("__sat_sum"),
      sum(when(col("__sat"), 0L).otherwise(1L)).as("__n_unsat"))
    flagged.crossJoin(broadcast(totals))
      .select(col(groupCol), col("n_tokens"), col("cap_tokens"),
        when(col("__sat"), col("cap_tokens"))
          .otherwise(expr(s"(${budget}L - __sat_sum) div __n_unsat"))
          .as("alloc_tokens"))
      // degenerate (0/NULL-token) sources: alloc*1000 div 0 is NULL
      // under non-ANSI div — pin to 0 epochs, matching
      // temperatureMixRates' explicit degenerate-source contract
      .withColumn("epochs_milli",
        when(col("n_tokens") <= 0, lit(0L))
          .otherwise(expr("alloc_tokens * 1000 div n_tokens")))
  }

  /** k-center greedy coreset selection (Gonzalez '85 farthest-point
    * 2-approximation) — the diverse-subset selection step of a
    * training-data curation pipeline: pick the k embeddings that best
    * COVER the corpus, maximizing the minimum pairwise distance, the
    * opposite selection pressure from near-dup removal. Returns
    * `(rank, vec_id, dist)` where `dist` is the squared-L2 coverage
    * radius at selection time — the monotone-decreasing sequence a
    * curation run reads to choose k.
    *
    * Scale shape: each of the k rounds is ONE narrow codegen pass — the
    * newest center ships as a literal float array into the `vec_dot`
    * kernel, the running min-distance is a `least` column, and the
    * farthest point reduces via TakeOrderedAndProject (never a global
    * sort). Driver state is k rows. The running distances PERSIST per
    * round (each round's frame caches, its parent uncaches one round
    * later once the child has materialized off it), so every round is
    * ONE narrow pass over the cached previous distances — O(n·k) total
    * work, not the O(n·k²) a recompute-from-base chain would cost; a
    * crossJoin alternative would be O(n·k) shuffled rows instead of
    * O(n) per pass. Distances are sequential-fold doubles (identical
    * fold order engine-to-engine), so the output is oracle-exact.
    *
    * Tie-break: lowest vec_id, so the selection is deterministic on
    * corpora with duplicate embeddings.
    */
  def kCenterSelect(emb: DataFrame, k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"kCenterSelect: k=$k")
    val spark = emb.sparkSession
    graft.GraftExtensions.registerTo(spark)
    import spark.implicits._
    def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vec_dot(a, b)
    def distTo(center: Array[Float]): Column = {
      val c = typedLit(center)
      (dot(col(vecCol), col(vecCol)) + dot(c, c)) - lit(2.0) * dot(col(vecCol), c)
    }
    val first = emb.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("kCenterSelect: empty input"))
    var selected = Vector((first.getLong(0), first.getSeq[Float](1).toArray, 0.0))
    var cur = emb.select(col(idCol), col(vecCol))
      .withColumn("d", distTo(selected.head._2)).persist()
    // the previous round's cache: freed only AFTER the current round's
    // top-1 has materialized the child off it — unpersisting earlier
    // would re-derive the whole least() chain from base every round
    var toFree: DataFrame = null
    // finally: a failed round (executor loss, OOM) must not leave the
    // O(n) distance frames pinned in the block manager for the session
    try {
      var r = 1
      while (r < k) {
        val next = cur.orderBy(col("d").desc, col(idCol)).limit(1).collect().head
        if (toFree != null) { toFree.unpersist(blocking = false); toFree = null }
        selected = selected :+ ((next.getLong(0), next.getSeq[Float](1).toArray,
          next.getDouble(2)))
        if (r + 1 < k) {
          toFree = cur
          cur = cur.withColumn("d", least(col("d"), distTo(selected.last._2))).persist()
        }
        r += 1
      }
    } finally {
      cur.unpersist(blocking = false)
      if (toFree != null) toFree.unpersist(blocking = false)
    }
    selected.zipWithIndex
      .map { case ((id, _, d), i) => (i, id, d) }
      .toDF("rank", idCol, "dist")
  }
}
