package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded-levenshtein rewrite.
  *
  * A thresholded edit-distance predicate written the natural way —
  * `levenshtein(a, b) <= k` — computes the FULL O(|a|·|b|) distance
  * matrix for every row and only then compares. Catalyst ships a banded
  * form, `levenshtein(a, b, k)`, that walks an O(k·min(|a|,|b|)) band
  * and bails out with -1 the moment the bound is exceeded — but nothing
  * rewrites the natural form into it. This rule does, for literal
  * bounds in Filter and Join conditions:
  *
  *   levenshtein(a, b) <= k   ⇒   abs(length(a) - length(b)) <= k
  *                                AND levenshtein(a, b, k) >= 0
  *
  * The conjoined length guard is implied (edit distance ≥ length
  * difference — each insert/delete changes length by 1), so semantics
  * are unchanged, and `And` short-circuits: rows that can't possibly
  * match never touch the distance loop at all. On a fuzzy self-join
  * this is the difference between O(n²·L²) and O(n²·k·L) with an O(1)
  * pre-reject — the rewrite every fuzzy-dedup user needs and few write.
  *
  * Null semantics are preserved exactly: the guard is null iff an input
  * is null, where the original is null too; `And(false, …)` only arises
  * from non-null lengths. Idempotent by construction — the rewritten
  * tree contains only three-arg (threshold=Some) forms, which no
  * pattern here matches.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or post-hoc through
  * `spark.experimental.extraOptimizations`.
  */
object LevenshteinBoundRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k, IntegerType)
    val guard = LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit)
    val banded = GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0, IntegerType))
    And(guard, banded)
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // lev(a,b) <= k / k >= lev(a,b)
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      bounded(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      bounded(a, b, k)
    // lev(a,b) < k / k > lev(a,b) — strict bound tightens to k-1
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      bounded(a, b, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
      bounded(a, b, k - 1)
    // lev(a,b) = k — band at k, then require the exact value
    case EqualTo(lev @ Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(Levenshtein(a, b, Some(Literal(k, IntegerType))), Literal(k, IntegerType))
    case EqualTo(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      EqualTo(Levenshtein(a, b, Some(Literal(k, IntegerType))), Literal(k, IntegerType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) =>
      val r = rewrite(cond)
      if (r fastEquals cond) j else j.copy(condition = Some(r))
  }
}
