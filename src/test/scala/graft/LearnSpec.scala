package graft

import graft.ops.Learn
import org.apache.spark.sql.functions._

class LearnSpec extends SparkSpec {

  import spark.implicits._

  test("perceptronFeatures: one bias row per doc, counts partition the tokens") {
    val docs = Tables.documents(spark, sf001)
    val feats = Learn.perceptronFeatures(docs)
    val nDocs = docs.count()
    assert(feats.filter(col("pos") === 8).count() === nDocs)
    // per-doc non-bias feature mass = token count
    val mass = feats.filter(col("pos") < 8)
      .groupBy("doc_id").agg(sum("xv").as("m"))
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("t"))
    assert(mass.join(toks, "doc_id").filter(col("m") =!= col("t")).count() === 0)
    // labels are ±1 and constant per doc
    assert(feats.select("y").distinct().collect().map(_.getLong(0)).toSet === Set(1L, -1L))
  }

  test("perceptronTrain converges to zero errors on linearly separable data") {
    // +1 docs carry 3 units of feature 0, -1 docs carry 1; bias at pos 1
    val feats = (0L until 20L).flatMap { d =>
      val y = if (d % 2 == 0) 1L else -1L
      Seq((d, y, 0, if (y > 0) 3L else 1L), (d, y, 1, 1L))
    }.toDF("doc_id", "y", "pos", "xv")
    val w = Learn.perceptronTrain(feats, iters = 10, dim = 1)
    val eval = Learn.perceptronEval(feats, w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(eval(1L)._1 === eval(1L)._2, "all positives classified correctly")
    assert(eval(-1L)._1 === eval(-1L)._2, "all negatives classified correctly")
  }

  test("margins: the weight vector joins features as a broadcast") {
    // the trainer's returned frame is localCheckpoint-cut (lineage
    // deliberately truncated), so assert on the margins stage — the hot
    // per-iteration join — directly
    val feats = Learn.perceptronFeatures(Tables.documents(spark, sf001))
    val w0 = spark.range(9).select(col("id").cast("int").as("pos"),
      org.apache.spark.sql.functions.lit(0L).as("w"))
    val plan = Learn.margins(feats, w0).queryExecution.executedPlan.toString
    // weights are feature-space-sized — they must broadcast to the
    // corpus, never shuffle it
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"weight join must broadcast:\n$plan")
  }

  test("perceptronTrain is invariant to input partitioning (exact integer updates)") {
    val docs = Tables.documents(spark, sf001)
    val a = Learn.perceptronTrain(Learn.perceptronFeatures(docs).repartition(17), 2)
      .collect().map(_.toString).sorted
    val b = Learn.perceptronTrain(Learn.perceptronFeatures(docs).coalesce(1), 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("calibrationReport: bins are relative to max |margin|, signed floor, rates exact") {
    // identity weight on pos 0 makes margins = xv: plant ±10, ±5 with
    // positives concentrated at the high end — bins must come out at
    // floor(m·4/10) ∈ {−4, −2, 2, 4} with the planted positive rates
    val feats = Seq(
      (1L, -1L, 0, -10L), (2L, -1L, 0, -5L),
      (3L, 1L, 0, 5L), (4L, -1L, 0, 5L), (5L, 1L, 0, 10L)
    ).toDF("doc_id", "y", "pos", "xv")
    val w = Seq((0, 1L)).toDF("pos", "w")
    val got = Learn.calibrationReport(feats, w)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pos_ppm")))).toMap
    assert(got === Map(
      -4L -> ((1L, 0L, 0L)),
      -2L -> ((1L, 0L, 0L)),
      2L  -> ((2L, 1L, 500000L)),
      4L  -> ((1L, 1L, 1000000L))))
    // degenerate all-zero margins collapse to one bin, never divide by 0
    val z = Learn.calibrationReport(
      feats.withColumn("xv", lit(0L)), w).collect()
    assert(z.length === 1 && z.head.getLong(0) === 0L)
  }
}
