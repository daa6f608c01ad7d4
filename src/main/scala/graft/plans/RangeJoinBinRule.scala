package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType}

/** Optimizer rule: interval-containment joins become binned equi-joins.
  *
  * A point-in-interval join written the natural way —
  *
  *   points.join(intervals, $"pt" >= $"lo" && $"pt" <= $"hi")
  *
  * — has no equality conjunct, so Spark plans a
  * BroadcastNestedLoopJoin: every point row is compared against every
  * interval row, O(|points|·|intervals|), single-task on the stream
  * side when broadcast. [[graft.ops.RangeJoin.pointInInterval]] is the
  * manual fix (explode each interval into fixed-width bins, equi-join
  * on the bin, keep the BETWEEN as residual); this rule applies the
  * same rewrite AUTOMATICALLY at optimization time, so the declarative
  * form stays declarative and still scales:
  *
  *   Join(P, I, Inner, pt >= lo && pt <= hi && rest)
  *     ⇒ Project(origOutput,
  *         Join(Project(P, + __graft_pt_bin = pt div w),
  *              Generate(explode(sequence(lo div w, hi div w)), I) as __graft_bin,
  *              Inner, __graft_pt_bin = __graft_bin && <original condition>))
  *
  * The original condition rides along as the residual filter, so
  * results are IDENTICAL row-for-row — each qualifying (point,
  * interval) pair shares exactly one bin (the point's), so no
  * duplicates are introduced, and the null/strict-bound semantics are
  * whatever the original predicate said.
  *
  * Fires only when ALL of:
  *   - `spark.graft.rangeJoin.binWidth` is set > 0 (session conf; the
  *     bin width is a data-dependent choice — roughly the typical
  *     interval length — the engine cannot guess safely);
  *   - the join is Inner with a deterministic condition;
  *   - the conjuncts contain `pt >= lo` and `pt <= hi` (either
  *     orientation, strict or non-strict) with `pt` referencing exactly
  *     one side and `lo`/`hi` both the other, all of byte/short/int/long
  *     type (a strict bound stays strict — it is re-checked by the
  *     residual; binning only needs lo div w ≤ pt div w ≤ hi div w,
  *     which the non-strict hull of any strict bound satisfies);
  *   - NO equality conjunct already links the two sides (if one does,
  *     Spark hash-partitions on it and the range is already residual).
  *
  * The last clause also makes the rule idempotent: the rewritten join's
  * condition contains the `__graft_pt_bin = __graft_bin` equality, so
  * the output never re-matches.
  *
  * Skew/outlier guard: an interval spanning more than
  * `spark.graft.rangeJoin.maxBins` bins (default 10000) raises at
  * runtime rather than silently exploding rows — mirroring
  * [[graft.ops.RangeJoin.pointInInterval]]'s contract that a year-long
  * interval at minute bins is a plan bug, not data.
  *
  * Reference analog: the stream/snapshot LSN fence and transaction
  * window alignment are one-sided range predicates
  * (`replicationcontext.go` LSN comparisons); this closes the
  * two-sided generalization over the same declarative surface.
  */
object RangeJoinBinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  private val MaxBinsKey  = "spark.graft.rangeJoin.maxBins"

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  /** (point, lo, hi) with pt's references wholly in one side and lo/hi
    * wholly in the other — or None when the shape doesn't hold. */
  private def containmentTriple(conjuncts: Seq[Expression], left: LogicalPlan,
                                right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = { // Some(true) = left
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // normalize each comparison into (smaller, larger)
    val lowers = scala.collection.mutable.ArrayBuffer[(Expression, Expression)]() // pt >= lo
    val uppers = scala.collection.mutable.ArrayBuffer[(Expression, Expression)]() // pt <= hi
    conjuncts.foreach {
      case GreaterThanOrEqual(a, b) => lowers += ((a, b)); uppers += ((b, a))
      case LessThanOrEqual(a, b)    => uppers += ((a, b)); lowers += ((b, a))
      case GreaterThan(a, b)        => lowers += ((a, b)); uppers += ((b, a))
      case LessThan(a, b)           => uppers += ((a, b)); lowers += ((b, a))
      case _                        =>
    }
    val candidates = for {
      (pt1, lo) <- lowers
      (pt2, hi) <- uppers
      if pt1.semanticEquals(pt2) && integral(pt1) && integral(lo) && integral(hi)
      ptSide <- sideOf(pt1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != ptSide
      if pt1.deterministic && lo.deterministic && hi.deterministic
    } yield (pt1, lo, hi, ptSide)
    candidates.headOption
  }

  /** True when some conjunct is an equality spanning both sides — the
    * join already has a hash key; leave it alone. */
  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)
    case EqualNullSafe(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)
    case _ => false
  }

  private def long(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(BinWidthKey, "0").toLong
    if (width <= 0) return plan
    val maxBins = conf.getConfString(MaxBinsKey, "10000").toLong

    plan.transformUp {
      // batch only: a streaming range join has its own state-store
      // machinery keyed on watermarks — a Generate under it would
      // detach the event-time column lineage the planner relies on
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && cond.deterministic && !j.isStreaming => {
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else containmentTriple(conjuncts, left, right) match {
          case None => j
          case Some((pt, lo, hi, ptOnLeft)) =>
            val w = Literal(width, LongType)
            val ptBin = Alias(IntegralDivide(long(pt), w), "__graft_pt_bin")()
            val loBin = IntegralDivide(long(lo), w)
            val hiBin = IntegralDivide(long(hi), w)
            // runtime outlier guard INSIDE the sequence start — a pruned
            // side column would never fire (RangeJoin.pointInInterval's
            // contract, same reasoning)
            val nBins = Add(Subtract(hiBin, loBin), Literal(1L, LongType))
            val guarded = If(GreaterThan(nBins, Literal(maxBins, LongType)),
              Cast(new RaiseError(Literal.create(
                s"RangeJoinBinRule: interval spans more than $maxBins bins of " +
                  s"width $width — widen $BinWidthKey or raise $MaxBinsKey",
                StringType)), LongType),
              loBin)
            val binAttr = AttributeReference("__graft_bin", LongType, nullable = true)()
            // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED
            // until the zone is bound (normally the analyzer's
            // ResolveTimeZone does this; optimizer-injected nodes must
            // bind it themselves).
            // An EMPTY interval (lo > hi) matches no point in the naive
            // join but would make sequence() THROW (start > stop with
            // step 1) — filter those rows out before the Generate. NULL
            // bounds need no guard: null-input sequence yields null,
            // which explode skips, matching BETWEEN-null's no-match.
            val nonEmpty = org.apache.spark.sql.catalyst.plans.logical.Filter(
              LessThanOrEqual(loBin, hiBin), if (ptOnLeft) right else left)
            val gen = Generate(
              Explode(new Sequence(guarded, hiBin, Some(Literal(1L, LongType)),
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr),
              child = nonEmpty)
            val ptSide = if (ptOnLeft) left else right
            val prj = Project(ptSide.output :+ ptBin, ptSide)
            val newCond = And(EqualTo(ptBin.toAttribute, binAttr), cond)
            val rewritten =
              if (ptOnLeft) Join(prj, gen, Inner, Some(newCond), hint)
              else Join(gen, prj, Inner, Some(newCond), hint)
            Project(j.output, rewritten)
        }
      }
    }
  }
}
