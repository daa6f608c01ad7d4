package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CmsEstimate, FloatVecDot, FloatVecNorm2, FnvHash64,
  NGramsJoin, PolyAt, PolyIn, PolyLen, PolySlice, UnicodeNormalize}

/** SparkSessionExtensions hook — registers the engine's custom Catalyst
  * expressions as SQL functions so `spark.sql("SELECT vec_dot(a, b) …")`
  * works alongside the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // bounded-levenshtein rewrite: natural `levenshtein(a,b) <= k`
    // filters become the banded O(k·n) form + an O(1) length guard
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBoundRule)
    // interval-containment joins become binned equi-joins (opt-in via
    // spark.graft.rangeJoin.binWidth) instead of nested-loop products
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBinRule)
  }
}

object GraftExtensions {
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))),
    (FunctionIdentifier("vec_norm2"),
      new ExpressionInfo(classOf[FloatVecNorm2].getName, "vec_norm2"),
      (children: Seq[Expression]) => FloatVecNorm2(children.head)),
    (FunctionIdentifier("fnv_hash64"),
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv_hash64"),
      (children: Seq[Expression]) => FnvHash64(children.head)),
    (FunctionIdentifier("graft_len"),
      new ExpressionInfo(classOf[PolyLen].getName, "graft_len"),
      (children: Seq[Expression]) => PolyLen(children.head)),
    (FunctionIdentifier("graft_slice"),
      new ExpressionInfo(classOf[PolySlice].getName, "graft_slice"),
      (children: Seq[Expression]) => PolySlice(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_at"),
      new ExpressionInfo(classOf[PolyAt].getName, "graft_at"),
      (children: Seq[Expression]) => PolyAt(children(0), children(1))),
    (FunctionIdentifier("graft_in"),
      new ExpressionInfo(classOf[PolyIn].getName, "graft_in"),
      (children: Seq[Expression]) => PolyIn(children(0), children(1))),
    (FunctionIdentifier("ngrams_join"),
      new ExpressionInfo(classOf[NGramsJoin].getName, "ngrams_join"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"ngrams_join(tokens, n) expects 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngrams_join(tokens, n): n must be an integer literal, got $other")
        }
        NGramsJoin(children(0), n)
      }),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children(0), children(1))),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => {
        val form = children match {
          case Seq(_) => "NFC"
          case Seq(_, org.apache.spark.sql.catalyst.expressions.Literal(f, _)) => f.toString
          case _ => throw new IllegalArgumentException(
            "unicode_normalize(s[, form]) expects 1-2 arguments, form a string literal")
        }
        UnicodeNormalize(children.head, form)
      })) ++ saturatingRegistrations

  /** The toolkit saturating i32 family as SQL functions — composed from
    * stock Catalyst arithmetic (BIGINT op, i32 / pos clamp), the same
    * trees `EventAnalytics.saturating*` builds through the Column API. */
  private def saturatingRegistrations
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Greatest, Least, Literal, Multiply, Subtract}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def make(name: String, op: (Expression, Expression) => Expression, lo: Long) =
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[Least].getName, name),
        (children: Seq[Expression]) => {
          if (children.length != 2) throw new IllegalArgumentException(
            s"$name(a, b) expects 2 arguments, got ${children.length}")
          val wide = op(Cast(children(0), LongType), Cast(children(1), LongType))
          Cast(Least(Seq(Greatest(Seq(wide, Literal(lo))),
            Literal(Int.MaxValue.toLong))), IntegerType)
        })
    Seq(
      make("saturating_add", Add(_, _), Int.MinValue.toLong),
      make("saturating_sub", Subtract(_, _), Int.MinValue.toLong),
      make("saturating_mul", Multiply(_, _), Int.MinValue.toLong),
      make("saturating_add_pos", Add(_, _), 0L),
      make("saturating_sub_pos", Subtract(_, _), 0L))
  }

  /** Attach to an already-built session (the extensions path only
    * applies at session construction). Functions land in the registry;
    * the optimizer rule rides `experimental.extraOptimizations`, the
    * documented live-session hook — added once, idempotently. */
  def registerTo(spark: org.apache.spark.sql.SparkSession): Unit = {
    registrations.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
    Seq(graft.plans.LevenshteinBoundRule, graft.plans.RangeJoinBinRule).foreach { r =>
      val extra = spark.experimental.extraOptimizations
      if (!extra.contains(r))
        spark.experimental.extraOptimizations = extra :+ r
    }
  }
}
