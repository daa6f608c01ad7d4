package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint checking — the CI gate a
  * corpus passes BEFORE training ever sees it (the Deequ/
  * great-expectations posture, re-expressed as single-pass Spark
  * aggregates). Ship gates fail on a report row, not on a mid-training
  * surprise.
  *
  * Scale shape: both ops compute ONE aggregate row over the corpus —
  * constraint violations as conditional sums (one scan, partial aggs,
  * no shuffle beyond the final single-row combine), column profiles as
  * multi-column distinct counts (Spark plans n distincts via one
  * Expand: n× the scan rows through ONE shuffle — the documented cost;
  * use [[columnProfileApprox]] when exact distinct counts don't earn
  * that at 100 TB). The wide single row then unpivots via `stack` —
  * driver never collects anything.
  */
object Profile {

  /** Per-column completeness/distinctness profile: one output row per
    * profiled column — `(column_name, n_rows, n_nulls, n_distinct)`.
    * Exact distinct counts (Expand plan; see object doc).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** [[columnProfile]] with HLL distinct counts (`approx_count_distinct`,
    * default 5% rsd): no Expand, plain partial aggregation — the 100 TB
    * default when the gate thresholds tolerate ±5%. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c)))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinct: String => Column): DataFrame = {
    require(cols.nonEmpty, "columnProfile: no columns to profile")
    cols.foreach(c => require(df.columns.contains(c),
      s"columnProfile: column '$c' not in ${df.columns.mkString(",")}"))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      distinct(c).as(s"__dist_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', `__null_$c`, `__dist_$c`").mkString(", ")
    one.select(
        col("__n").as("n_rows"),
        expr(s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
  }

  /** Declarative row-level constraints evaluated corpus-wide in one
    * scan: each named predicate yields `(constraint, n_rows,
    * n_violations, passed)`. NULL predicate results count as
    * violations (a constraint that cannot be evaluated did not pass —
    * the fail-closed reading a ship gate needs).
    */
  def checkConstraints(df: DataFrame,
                       constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "checkConstraints: no constraints")
    val names = constraints.map(_._1)
    require(names.distinct.size == names.size,
      s"checkConstraints: duplicate constraint names in ${names.mkString(",")}")
    val aggs = count(lit(1)).as("__n") +: constraints.map { case (n, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__v_$n")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = constraints.map { case (n, _) => s"'$n', `__v_$n`" }.mkString(", ")
    one.select(
        col("__n").as("n_rows"),
        expr(s"stack(${constraints.length}, $stacked) AS (constraint, n_violations)"))
      .select(col("constraint"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Key-skew report — the diagnostic to run BEFORE keying a 100 TB
    * join/groupBy on a column: the top-k hottest keys with their exact
    * row share (ppm, integer `cnt·10⁶ div total`) plus the cumulative
    * share of the top-k. A top key near the per-task row budget means
    * salting ([[Skew]]) or AQE skew handling is mandatory, not
    * optional. One partial-agg shuffle + TakeOrderedAndProject.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject — distributed
    // partial top-k per partition); the global window then ranks only
    // the K survivors, never the keys-sized counts table
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col(keyCol))))
      .withColumn("share_ppm", expr("cnt * 1000000 div __total"))
      .withColumn("cum_share_ppm",
        expr("sum(cnt) over (order by rank) * 1000000 div __total"))
      .select(col("rank"), col(keyCol).as("key"), col("cnt"),
        col("share_ppm"), col("cum_share_ppm"))
  }

  /** Robust per-group outlier report — median/MAD, the
    * estimator family that survives the very outliers it hunts (mean/
    * stddev gates move with the contamination; the 50% breakdown point
    * of the median does not). Integer-exact: "median" is DEFINED as the
    * lower median (the element at 1-based rank `(n+1) div 2` under a
    * (value, id) total order), MAD as the lower median of |x − med|,
    * and the gate as `|x − med| > k·MAD` — all longs, no interpolation,
    * so the oracle replays it bit-for-bit.
    *
    * Scale shape: two window shuffles on the group key (rank for the
    * median, rank for the MAD) + broadcast-sized joins of the per-group
    * scalars. Groups are sources/domains — many small partitions, the
    * shape window functions like.
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Int = 3,
                  groupCol: String = "source",
                  idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"madOutliers: k=$k must be >= 1")
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("__v"), col(idCol))
    val wg = Window.partitionBy(col(groupCol))
    val base = df.select(col(groupCol), col(idCol), col(valueCol).cast("long").as("__v"))
      .withColumn("__rn", row_number().over(wv))
      .withColumn("__n", count(lit(1)).over(wg))
    val med = base.filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(groupCol), col("__v").as("med"))
    val dev = base.join(med, groupCol)
      .withColumn("__dev", abs(col("__v") - col("med")))
    val wd = Window.partitionBy(col(groupCol)).orderBy(col("__dev"), col(idCol))
    val mad = dev.withColumn("__rd", row_number().over(wd))
      .filter(col("__rd") === expr("(__n + 1) div 2"))
      .select(col(groupCol), col("__dev").as("mad"))
    dev.join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("median"), min(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k.toLong) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(when(col("__dev") > lit(k.toLong) * col("mad"), col("__v"))).as("worst_value"))
  }

  /** k-anonymity audit over a quasi-identifier column set — the
    * governance gate for releasing/training on user-adjacent data: any
    * QI combination shared by fewer than `k` rows re-identifies its
    * members (Sweeney 2002). One partial-agg shuffle on the QI key;
    * output is a 1-row report (gate on `n_rows_at_risk == 0`) — the
    * smallest-group examples stay in the engine, deliberately: a
    * violation REPORT that itself lists rare QI combos would leak what
    * it polices.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, s"kAnonymity: need QI columns and k >= 2 (got $k)")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__sz")).as("min_group_size"))
      .select(lit(qiCols.mkString(",")).as("qi"), lit(k.toLong).as("k"),
        col("n_groups"), col("n_small_groups"), col("n_rows_at_risk"),
        col("min_group_size"),
        (col("n_rows_at_risk") === 0L).as("passed"))
  }

  /** l-diversity audit — [[kAnonymity]]'s companion (Machanavajjhala et
    * al. 2006): a QI group can be k-large yet still disclose its
    * members' SENSITIVE attribute if everyone in it shares one value;
    * the gate requires ≥ `l` distinct sensitive values per group. Same
    * one-shuffle shape (QI-keyed agg with a distinct count), same
    * examples-withheld 1-row report.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(qiCols.nonEmpty && l >= 2, s"lDiversity: need QI columns and l >= 2 (got $l)")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col(sensitiveCol)).as("__nv"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__nv") < l, 1L).otherwise(0L)).as("n_undiverse_groups"),
        sum(when(col("__nv") < l, col("__sz")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__nv")).as("min_diversity"))
      .select(lit(qiCols.mkString(",")).as("qi"), lit(sensitiveCol).as("sensitive"),
        lit(l.toLong).as("l"), col("n_groups"), col("n_undiverse_groups"),
        col("n_rows_at_risk"), col("min_diversity"),
        (col("n_rows_at_risk") === 0L).as("passed"))
  }

  /** Exact heavy hitters with BOUNDED intermediate state — the two-pass
    * hash-filter construction (the deterministic cousin of Misra-Gries /
    * count-min candidate generation): pass 1 aggregates counts over
    * `nBuckets` FNV hash buckets (state = nBuckets rows, independent of
    * key cardinality); pass 2 counts exactly ONLY the keys whose bucket
    * total reaches `minCount` (a bucket's count upper-bounds every key
    * inside it, so no true heavy hitter can be filtered — supersets are
    * safe, and the second exact pass removes false positives). Output is
    * EXACTLY the keys with frequency ≥ `minCount` — same answer as a
    * full groupBy, but the first shuffle moves nBuckets partial rows per
    * task instead of |distinct keys|, which at 100 TB of tokens is the
    * difference between a bounded map-side combine and a trillion-row
    * aggregate. Both passes are deterministic, so the result is
    * oracle-replicable (unlike per-partition MG summaries, whose
    * candidate set depends on the partition layout).
    */
  def heavyHitters(keys: DataFrame, keyCol: String, minCount: Long,
                   nBuckets: Int = 1 << 16): DataFrame = {
    require(minCount >= 1, s"heavyHitters: minCount=$minCount must be >= 1")
    require(nBuckets >= 2, s"heavyHitters: nBuckets=$nBuckets must be >= 2")
    val bucket = graft.functions.FnvHash64.remainderUnsigned(
      graft.functions.FnvHash64.fnv_hash64(col(keyCol).cast("string")), nBuckets.toLong)
    val hot = keys.groupBy(bucket.as("__bucket"))
      .agg(count(lit(1)).as("__bcnt"))
      .filter(col("__bcnt") >= minCount)
      .select(col("__bucket"))
    keys.withColumn("__bucket", bucket)
      .join(broadcast(hot), Seq("__bucket"), "leftsemi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Benford first-digit expectations `log₁₀(1 + 1/d)` in ppm — the
    * plan-time constant table [[benfordReport]] and its oracle twin
    * both read (the NDCG-discount discipline: the transcendental runs
    * ONCE in Scala, never inside an engine). */
  val BenfordExpectedPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000000.0 + 0.5).toLong)

  /** Benford's-law first-digit audit over a positive integer column —
    * the classic fabricated/degenerate-numeric screen (naturally
    * occurring multi-magnitude quantities front-load small leading
    * digits; synthetic or truncated feeds don't): per digit 1–9 the
    * observed count, observed share in ppm, and the Benford expectation
    * as a plan-time literal. The first digit comes from the DECIMAL
    * STRING of the integer (both engines render positive integers
    * identically — no float formatting crossing). Zero/negative values
    * are excluded by contract (they have no Benford digit). One partial
    * agg to ≤9 rows; the digit grid joins as a 9-row broadcast.
    */
  def benfordReport(df: DataFrame, intCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df.filter(col(intCol) > 0)
      .select(expr(s"CAST(substring(CAST($intCol AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum(col("n_obs")).as("__t"))
    val expectedCase = "CASE digit " + BenfordExpectedPpm.map {
      case (d, e) => s"WHEN $d THEN ${e}L"
    }.mkString(" ") + " END"
    spark.range(1, 10).select(col("id").cast("int").as("digit"))
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        expr("(coalesce(n_obs, 0L) * 1000000) div __t").as("obs_ppm"),
        expr(expectedCase).as("expected_ppm"))
  }

  /** Gini coefficient of the doc and token mass across sources — the
    * one-number inequality read on a training mix (G = 0 every source
    * contributes equally, G → 1 one source dominates; the number the
    * UniMax/temperature mixers exist to push DOWN). Exact integers via
    * the sorted-rank identity `G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)`
    * in ppm — rank ties are broken by source name, which the identity
    * is invariant to (permuting equal values never changes Σ i·x₍ᵢ₎'s
    * value... the swapped terms exchange equal x's).
    *
    * Scale shape: one partial agg to |sources| rows; the rank windows
    * run over that group-count-sized frame (NOT the corpus — the
    * global orderBy is bounded by the source vocabulary), then a
    * single-row final agg.
    */
  def giniReport(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val ranked = per
      .withColumn("__rt", row_number().over(
        Window.orderBy(col("n_tokens"), col(groupCol))).cast("long"))
      .withColumn("__rd", row_number().over(
        Window.orderBy(col("n_docs"), col(groupCol))).cast("long"))
    ranked.agg(
        count(lit(1)).as("n_groups"),
        sum(col("n_docs")).as("total_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("__rt") * col("n_tokens")).as("__st"),
        sum(col("__rd") * col("n_docs")).as("__sd"))
      .select(col("n_groups"), col("total_docs"), col("total_tokens"),
        expr("""CASE WHEN n_groups * total_tokens = 0 THEN 0
               |  ELSE ((2 * __st - (n_groups + 1) * total_tokens) * 1000000)
               |       div (n_groups * total_tokens) END""".stripMargin)
          .as("gini_tokens_ppm"),
        expr("""CASE WHEN n_groups * total_docs = 0 THEN 0
               |  ELSE ((2 * __sd - (n_groups + 1) * total_docs) * 1000000)
               |       div (n_groups * total_docs) END""".stripMargin)
          .as("gini_docs_ppm"))
  }

  /** Heaps'-law vocabulary growth curve (Heaps 1978): distinct-token
    * count as a function of corpus prefix size, the number that sizes a
    * tokenizer vocabulary and predicts OOV rates before committing a
    * 100 TB tokenization run. The curve V(n) ≈ K·nᵝ is read off
    * empirically at id-prefix checkpoints (ppm fractions of max doc_id,
    * integer-exact on both engines — no data-dependent logs, the
    * fit exponent is the consumer's one division away).
    *
    * Relational trick that avoids cumulative-distinct blowup: a token
    * first enters the vocabulary at its MINIMUM doc id, so V(cutoff) =
    * #tokens with first_doc ≤ cutoff — ONE groupBy over tokens (linear,
    * map-side combinable) + one conditional-sum pass, instead of a
    * distinct per checkpoint. Tokenization = `split(text, " ")`, the
    * same whitespace recipe the vocab/tokenize gates already
    * hash-verify cross-engine.
    */
  def heapsCurve(docs: DataFrame,
                 fractionsPpm: Seq[Long] = Seq(125000L, 250000L, 500000L, 1000000L),
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(fractionsPpm.nonEmpty && fractionsPpm.forall(f => f > 0 && f <= 1000000L),
      s"heapsCurve: fractions must be ppm in (0, 1e6], got $fractionsPpm")
    val mx = docs.agg(max(col(idCol)).as("__mx"))
    def cutoff(f: Long) = expr(s"(__mx * ${f}L) div 1000000L")
    val firstOccur = docs
      .select(col(idCol).as("__id"), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(min(col("__id")).as("first_doc"))
    val vAggs = fractionsPpm.map(f =>
      sum(when(col("first_doc") <= cutoff(f), 1L).otherwise(0L)).as(s"__v_$f"))
    val v = firstOccur.crossJoin(broadcast(mx)).agg(vAggs.head, vAggs.tail: _*)
    val dAggs = fractionsPpm.map(f =>
      sum(when(col("__id") <= cutoff(f), 1L).otherwise(0L)).as(s"__n_$f")) :+
      first(col("__mx")).as("__mx")
    val d = docs.select(col(idCol).as("__id")).crossJoin(broadcast(mx))
      .agg(dAggs.head, dAggs.tail: _*)
    v.crossJoin(d)
      .select(explode(array(fractionsPpm.map { f =>
        struct(lit(f).as("frac_ppm"), cutoff(f).as("cutoff_id"),
          col(s"__n_$f").as("n_docs"), col(s"__v_$f").as("vocab"))
      }: _*)).as("r"))
      .select(col("r.frac_ppm"), col("r.cutoff_id"), col("r.n_docs"), col("r.vocab"))
  }
}
