package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.RangeJoinBinRule]]: the declarative BETWEEN join is
  * rewritten into a binned equi-join — identical rows, no nested-loop
  * physical join — and never fires where it must not. */
class RangeJoinRuleSpec extends SparkSpec {

  private def withBinWidth[T](w: Long)(body: => T): T = {
    GraftExtensions.registerTo(spark)
    spark.conf.set("spark.graft.rangeJoin.binWidth", w.toString)
    try body finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  private def points: DataFrame = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i * 13 % 1000)).toDF("p_id", "pt")
  }
  private def intervals: DataFrame = {
    import spark.implicits._
    (0L until 60L).map(i => (i, i * 17 % 900, i * 17 % 900 + i % 50)).toDF("i_id", "lo", "hi")
  }

  private def naive: DataFrame =
    points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select(col("p_id"), col("i_id"))

  test("rewritten join matches the nested-loop result row-for-row") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    val got = withBinWidth(32) {
      val df = naive
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("Generate") || plan.contains("explode"),
        s"expected the binning Generate in the plan:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("strict bounds and reversed operand orientation both rewrite, same rows") {
    // QueryExecution caches its plan at first action, so the DataFrame
    // must be REBUILT under the conf — a def, not a shared val
    def naiveStrict =
      points.join(intervals, col("lo") < col("pt") && col("hi") > col("pt"))
        .select(col("p_id"), col("i_id"))
    val expected = naiveStrict.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = withBinWidth(32) {
      val df = naiveStrict
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("extra residual conjuncts ride along unchanged") {
    def q = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi") && col("i_id") % 2 === 0)
      .select(col("p_id"), col("i_id"))
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = withBinWidth(32) {
      val df = q
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(got.toSeq === expected.toSeq)
  }

  test("does not fire: conf unset, equi-key present, non-inner join") {
    GraftExtensions.registerTo(spark)
    // conf unset (or 0) — plan keeps the nested loop
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    assert(naive.queryExecution.executedPlan.toString()
      .contains("BroadcastNestedLoopJoin"))
    withBinWidth(32) {
      // an equality conjunct already links the sides → leave the join alone
      val equi = points.join(intervals,
          col("p_id") === col("i_id") && col("pt") >= col("lo") && col("pt") <= col("hi"))
      val ep = equi.queryExecution.executedPlan.toString()
      assert(!ep.contains("__graft_bin"), s"rule fired on an equi join:\n$ep")
      // left-outer containment join → not rewritten (Inner only)
      val outer = points.join(intervals,
          col("pt") >= col("lo") && col("pt") <= col("hi"), "left")
      assert(!outer.queryExecution.executedPlan.toString().contains("__graft_bin"))
    }
  }

  test("oversized interval raises instead of exploding rows") {
    import spark.implicits._
    val wide = Seq((1L, 0L, 10_000_000L)).toDF("i_id", "lo", "hi")
    withBinWidth(10) {
      val q = points.join(wide, col("pt") >= col("lo") && col("pt") <= col("hi"))
      val e = intercept[Exception](q.collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("RangeJoinBinRule")), s"got: ${msgs(e)}")
    }
  }

  test("property: rule on/off agree for arbitrary data, widths, and signs") {
    import spark.implicits._
    GraftExtensions.registerTo(spark)
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      // negative points/bounds included: integer `div` rounds toward
      // negative infinity differently than `/` — the bin must still
      // cover every qualifying pair
      val pts = (0 until 200).map(i =>
        (i.toLong, rnd.nextLong(4000) - 2000L)).toDF("p_id", "pt")
      // every 5th interval EMPTY (lo > hi): the naive join drops it;
      // the rewrite must too, not throw on sequence(start > stop)
      val ivs = (0 until 40).map { i =>
        val lo = rnd.nextLong(4000) - 2000L
        val hi = if (i % 5 == 0) lo - 1 - rnd.nextLong(100) else lo + rnd.nextLong(300)
        (i.toLong, lo, hi)
      }.toDF("i_id", "lo", "hi")
      def q = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select(col("p_id"), col("i_id"))
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      Seq(1L, 7L, 250L, 100000L).foreach { w =>
        val got = withBinWidth(w) {
          q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        }
        assert(got === expected, s"trial=$trial width=$w")
      }
    }
  }

  test("idempotent: one Generate, one equi join, applied once") {
    withBinWidth(32) {
      val plan = naive.queryExecution.optimizedPlan.toString()
      assert(plan.contains("__graft_bin"))
      // exactly one binning Generate introduced — a second application
      // would nest another
      assert(plan.linesIterator.count(_.contains("Generate explode(sequence")) === 1, plan)
    }
  }
}
