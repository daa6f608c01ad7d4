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

  test("lshCosinePairs keeps the shuffle-light shape: one self-join, no post-candidate joins") {
    // The r16 rewrite's contract: the bucket self-join is the ONLY join
    // in the plan (the old shape re-joined the embeddings twice onto
    // the candidate set — Θ(candidates) fat-row shuffles, the sf6.4 JVM
    // killer). Count join nodes in the physical plan, not exchanges:
    // exchange count varies with AQE/broadcast thresholds, join count
    // is the structural invariant.
    val plan = ops.Similarity
      .lshCosinePairs(Tables.embeddings(spark, sf001), dim = 64, threshold = 0.3)
      .queryExecution.executedPlan.toString()
    val joins = "(?i)(sortmergejoin|shuffledhashjoin|broadcasthashjoin)"
      .r.findAllIn(plan).length
    assert(joins === 1, s"expected exactly the bucket self-join, found $joins:\n$plan")
  }
}
