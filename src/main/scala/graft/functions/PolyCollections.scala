package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Polymorphic collection accessors for the event-filter translator —
  * the Catalyst twins of expr-lang's slice `x[a:b]`, index `x[i]`, and
  * `v in collection` forms, which are type-dispatched in the reference
  * dialect (strings, arrays, maps) while every Spark builtin is
  * monomorphic. All three are `RuntimeReplaceable`: the dispatch
  * happens ONCE at analysis (child types are known by then) and the
  * plan that executes is the ordinary codegen'd builtin — no custom
  * eval in the hot path.
  */

private[functions] object PolyIndex {
  /** Python/expr-lang index normalization: negative counts from the
    * end (`x[-1]` = last), clamped at 0 for slices. */
  def norm(idx: Expression, len: Expression, clamp: Boolean): Expression = {
    val i = Cast(idx, IntegerType)
    val fromEnd = Add(len, i)
    val adj = if (clamp) If(LessThan(fromEnd, Literal(0)), Literal(0), fromEnd)
              else fromEnd
    If(LessThan(i, Literal(0)), adj, i)
  }
}

/** expr-lang `x[a:b]` — 0-based, end-exclusive slice of a string or
  * array; negative bounds count from the end (python semantics, what
  * the dialect implements); `b ≤ a` after normalization yields empty. */
case class PolySlice(input: Expression, from: Expression, until: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = {
    val len = input.dataType match {
      case StringType   => Length(input)
      case _: ArrayType => Size(input, legacySizeOfNull = false)
      case t => throw new IllegalArgumentException(
        s"graft_slice requires string or array input, got $t")
    }
    val a = PolyIndex.norm(from, len, clamp = true)
    val b = PolyIndex.norm(until, len, clamp = true)
    val diff = Subtract(b, a)
    val count = If(GreaterThan(diff, Literal(0)), diff, Literal(0))
    val start = Add(a, Literal(1))
    input.dataType match {
      case StringType => Substring(input, start, count)
      case _          => Slice(input, start, count)
    }
  }
  override def children: Seq[Expression] = Seq(input, from, until)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2))
  override def prettyName: String = "graft_slice"
}

/** expr-lang `x[i]` — 0-based index into an array, key lookup in a map,
  * single-character slice of a string; negative indices count from the
  * end; out-of-range/missing yields nil (NULL), the dialect's behavior
  * for optional access. */
case class PolyAt(input: Expression, index: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = input.dataType match {
    case StringType =>
      val i = PolyIndex.norm(index, Length(input), clamp = false)
      // out-of-range must be nil, not '' — expr-lang optional access
      val ch = Substring(input, Add(i, Literal(1)), Literal(1))
      If(Or(LessThan(i, Literal(0)), GreaterThanOrEqual(i, Length(input))),
        Literal.create(null, StringType), ch)
    case _: ArrayType =>
      // failOnError=false: out-of-range is nil in the dialect, and ANSI
      // mode (Spark 4's default) would otherwise THROW on the empty/
      // past-the-end access (the `get()` builtin's behavior)
      GetArrayItem(input,
        PolyIndex.norm(index, Size(input, legacySizeOfNull = false), clamp = false),
        failOnError = false)
    case _: MapType   => GetMapValue(input, index)
    // struct member (the `?.` chain compiles through graft_at so every
    // access is total): field name must be a plan-time literal, missing
    // field fails loudly at analysis — GetStructField null-propagates a
    // nil base, which IS the optional-chaining contract
    case s: StructType =>
      val key = index match {
        case Literal(v, StringType) if v != null => v.toString
        case _ => throw new IllegalArgumentException(
          "graft_at on a struct requires a literal field name")
      }
      val ord = s.fieldNames.indexWhere(_.equalsIgnoreCase(key))
      if (ord < 0) throw new IllegalArgumentException(
        s"graft_at: no field '$key' in struct<${s.fieldNames.mkString(",")}>")
      GetStructField(input, ord, Some(s.fieldNames(ord)))
    case t => throw new IllegalArgumentException(
      s"graft_at requires string, array, map, or struct input, got $t")
  }
  override def children: Seq[Expression] = Seq(input, index)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
  override def prettyName: String = "graft_at"
}

/** expr-lang `v in xs` over a non-list operand: array membership, or
  * KEY membership for maps (`"k" in {"k": 1}` is true — the dialect
  * checks keys, Go-map style). Mixed numeric widths (an int literal
  * probed against a bigint range) are widened to the tightest common
  * type here — the replacement is built AFTER analysis-time implicit
  * coercion has run, so ArrayContains would otherwise stay unresolved
  * on any width mismatch. */
case class PolyIn(item: Expression, collection: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = {
    val elems = collection.dataType match {
      case _: ArrayType => collection
      case _: MapType   => MapKeys(collection)
      case t => throw new IllegalArgumentException(
        s"graft_in requires an array or map collection, got $t")
    }
    val elemT = elems.dataType.asInstanceOf[ArrayType].elementType
    if (elemT == item.dataType) ArrayContains(elems, item)
    else org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findTightestCommonType(item.dataType, elemT) match {
        case Some(t) =>
          ArrayContains(Cast(elems, ArrayType(t)), Cast(item, t))
        case None => ArrayContains(elems, item) // unresolvable: fail loudly
      }
  }
  override def children: Seq[Expression] = Seq(item, collection)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
  override def prettyName: String = "graft_in"
}
