package graft

/** Whole-surface plan audit: build the PHYSICAL plan of every query in
  * `SparkEntry.queries` (plan-only — nothing executes) and reject the
  * anti-patterns that sink a 100 TB run:
  *
  *  - `CartesianProduct` — an unkeyed data×data join. The deliberate
  *    1-row stat broadcasts compile to BroadcastNestedLoopJoin, which
  *    stays legal; a real cartesian means someone dropped a join key.
  *
  * This is the regression net for "the query still answers right but
  * the plan quietly degraded" — hash checks can't see it, this does.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a CartesianProduct (sf0.001, every SparkEntry query)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf001).queryExecution.executedPlan.toString()
        if (plan.contains("CartesianProduct")) Some(name -> "CartesianProduct")
        else None
      } catch {
        case e: Throwable => Some(name -> s"PLAN BUILD FAILED: ${e.getMessage}")
      }
    }
    assert(offenders.isEmpty, offenders.map { case (n, w) => s"$n: $w" }.mkString("\n"))
  }
}
