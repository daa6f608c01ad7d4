package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed classifier TRAINING over the corpus — the missing third
  * of the quality-filter story: [[TextAnalysis]] scores documents with
  * fixed weights; this learns the weights on the cluster. The model is
  * a batch perceptron over SPARSE integer features: updates are exact
  * integer sums (order-independent, partitioning-invariant), so a SQL
  * oracle can unroll the identical iterations and hash-match — the same
  * exactness posture as [[Graph.pageRankInt]] and the fixed-point
  * rankers.
  *
  * Sparse `(doc_id, pos, xv)` rows are the 100 TB form: a hashed-vocab
  * feature space never materializes dense vectors, joins stay
  * equi-joins on `pos`/`doc_id`, and the weight vector (bounded by the
  * feature space, not the corpus) broadcasts.
  */
object Learn {

  /** Featurize documents for [[perceptronTrain]]: sparse token-shape
    * counts — `pos = len(token) mod dim` buckets plus a bias feature at
    * `pos = dim` — with label `y = +1` for `lang == positiveLang`, else
    * `-1`. Deliberately cheap, deterministic, engine-neutral features;
    * swap in `hash_embed` buckets for a real hashed vocabulary (same
    * sparse shape, same trainer).
    */
  def perceptronFeatures(docs: DataFrame, dim: Int = 8,
                         positiveLang: String = "en"): DataFrame = {
    val y = when(col("lang") === positiveLang, 1L).otherwise(-1L).as("y")
    // ONE corpus pass: each doc explodes to its token POSITIONS plus the
    // appended bias position `dim` (disjoint from pmod's 0..dim-1 range,
    // so the shared groupBy counts it as exactly the old union's
    // (pos=dim, xv=1) row; a null text keeps its bias via the coalesce).
    // The former two-branch union both re-scanned the corpus AND — with
    // co-partitioned inputs — tripped UnionExec's partitioning-
    // preserving zip on mismatched child partition counts.
    docs
      .select(col("doc_id"), y,
        explode(array_append(
          transform(coalesce(split(col("text"), " "),
            array().cast("array<string>")),
            t => pmod(length(t), lit(dim))),
          lit(dim))).as("pos"))
      .groupBy(col("doc_id"), col("y"), col("pos").cast("int").as("pos"))
      .agg(count(lit(1)).as("xv"))
  }

  /** Batch (synchronous) perceptron, `iters` full passes: per
    * iteration every document's margin `y·(w·x)` is computed; the
    * gradient `Σ y·x` over ALL misclassified documents (margin ≤ 0)
    * applies at once with learning rate 1. Batch-and-sum (vs the
    * classic sequential perceptron) is what makes the update
    * order-independent and therefore distributed-deterministic.
    *
    * Scale shape per iteration: the weight vector joins features as a
    * BROADCAST on `pos` (weights are feature-space-sized, never
    * corpus-sized), margins are one partial-agg shuffle on `doc_id`,
    * the gradient one semi-join on `doc_id` + one partial-agg on `pos`.
    * The weight lineage is cut each round (`localCheckpoint`), same
    * posture as the label-propagation and PageRank loops.
    */
  def perceptronTrain(feats: DataFrame, iters: Int, dim: Int = 8): DataFrame = {
    val spark = feats.sparkSession
    var w = spark.range(dim + 1)
      .select(col("id").cast("int").as("pos"), lit(0L).as("w"))
    for (_ <- 1 to iters) {
      val mis = margins(feats, w).filter(col("y") * col("margin") <= 0)
        .select(col("doc_id"))
      val grad = feats.join(mis, Seq("doc_id"), "left_semi")
        .groupBy(col("pos")).agg(sum(col("y") * col("xv")).as("g"))
      w = w.join(grad, Seq("pos"), "left")
        .select(col("pos"), (col("w") + coalesce(col("g"), lit(0L))).as("w"))
        .localCheckpoint(eager = false)
    }
    w
  }

  /** Per-document margins `y, w·x` under a weight vector. */
  def margins(feats: DataFrame, w: DataFrame): DataFrame =
    feats.join(broadcast(w), "pos")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("xv") * col("w")).as("margin"))

  /** Training-set confusion summary for a trained `w`: per label class,
    * document count and how many the hyperplane classifies correctly
    * (margin strictly positive — ties count as errors, the perceptron's
    * own convention). */
  def perceptronEval(feats: DataFrame, w: DataFrame): DataFrame =
    margins(feats, w)
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") * col("margin") > 0, 1L).otherwise(0L)).as("n_correct"))

  /** Calibration (reliability) report for a trained hyperplane: margin
    * scores bucketed into 2·nBins+1 bins RELATIVE to the corpus-wide
    * max |margin| (a 1-row broadcast — raw perceptron margins grow
    * with both corpus and weight scale, so any fixed width collapses
    * at a different SF), with the empirical positive rate per bin —
    * the standard check that a classifier's score ORDER carries
    * probability information before it gates a corpus (a
    * well-calibrated filter shows monotone pos_ppm across bins).
    * Relative fixed-width binning (not ntile) on purpose: deciles
    * would need a corpus-wide sort; this is one partial-agg shuffle
    * plus the scalar broadcast. The bin index floors in DOUBLE
    * (margins are signed — integer `div` truncates toward zero in
    * Spark but floors in DuckDB, so a negative-margin `div` would
    * diverge between engines; `FLOOR(x·n/max)` is the portable floor
    * division, exact here because |margin| ≪ 2⁵³).
    */
  def calibrationReport(feats: DataFrame, w: DataFrame,
                        nBins: Int = 4): DataFrame = {
    require(nBins > 0, "calibrationReport: nBins must be positive")
    val m = margins(feats, w)
    val mx = m.agg(max(abs(col("margin"))).as("__maxabs"))
    m.crossJoin(broadcast(mx))
      .withColumn("bin", expr(
        s"""CASE WHEN __maxabs = 0 THEN CAST(0 AS BIGINT)
           |     ELSE greatest(CAST(-$nBins AS BIGINT), least(CAST($nBins AS BIGINT),
           |       CAST(FLOOR(CAST(margin AS DOUBLE) * $nBins.0
           |                  / CAST(__maxabs AS DOUBLE)) AS BIGINT))) END""".stripMargin))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_ppm", expr("(n_pos * 1000000) div n_docs"))
  }
}
