package graft

import graft.cdc.Cdc
import org.apache.spark.sql.functions._

/** Render-late multi-table envelopes: byte parity with the render-early
  * path, plan shape (sort below the render projection), and the
  * pre-sorted output contract. */
class EnvelopeRenderSpec extends SparkSpec {

  test("render-late output is byte-identical to the render-early path") {
    val early = Cdc.multiTableEnvelopes(spark, sf001)
      .select("topic", "lsn", "envelope", "key_json")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val late = Cdc.multiTableEnvelopesSorted(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(late.size === early.size)
    assert(late === early, {
      val diff = (late -- early).take(1) ++ (early -- late).take(1)
      s"first divergent rows: $diff"
    })
  }

  test("the sort runs over narrow columns — the envelope Project sits above it") {
    val plan = Cdc.multiTableEnvelopesSorted(spark, sf001)
      .queryExecution.optimizedPlan
    // top of the optimized plan: a Project whose child subtree contains
    // the Sort; the sort's own output must NOT contain the rendered
    // envelope (that's the whole point)
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val top = plan.collectFirst { case p: Project => p }.get
    val sortBelow = top.child.collectFirst { case s: Sort => s }
    assert(sortBelow.isDefined, s"expected a Sort below the render Project:\n$plan")
    val sortedCols = sortBelow.get.output.map(_.name).toSet
    assert(!sortedCols.contains("envelope") && !sortedCols.contains("key_json"),
      s"sort must move narrow columns only, got $sortedCols")
  }

  test("rows emerge ordered by (topic, lsn) without a trailing sort") {
    val rows = Cdc.multiTableEnvelopesSorted(spark, sf001)
      .select("topic", "lsn").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.sameElements(rows.sortBy(identity)), "output must arrive pre-sorted")
  }
}
