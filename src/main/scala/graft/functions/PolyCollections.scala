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

/** expr-lang `x[a:b]` — 0-based, end-exclusive slice of a string or
  * array; `b < a` yields empty. Negative (from-end) indices are outside
  * the columnar subset — the translator documents the limitation. */
case class PolySlice(input: Expression, from: Expression, until: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = {
    val start = Add(from, Literal(1))
    val diff = Subtract(until, from)
    val count = If(GreaterThan(diff, Literal(0)), diff, Literal(0))
    input.dataType match {
      case StringType   => Substring(input, start, count)
      case _: ArrayType => Slice(input, start, count)
      case t => throw new IllegalArgumentException(
        s"graft_slice requires string or array input, got $t")
    }
  }
  override def children: Seq[Expression] = Seq(input, from, until)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2))
  override def prettyName: String = "graft_slice"
}

/** expr-lang `x[i]` — 0-based index into an array, key lookup in a map,
  * single-character slice of a string; out-of-range/missing yields
  * nil (NULL), the dialect's behavior for optional access. */
case class PolyAt(input: Expression, index: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = input.dataType match {
    case StringType   => Substring(input, Add(index, Literal(1)), Literal(1))
    case _: ArrayType => GetArrayItem(input, index)
    case _: MapType   => GetMapValue(input, index)
    case t => throw new IllegalArgumentException(
      s"graft_at requires string, array, or map input, got $t")
  }
  override def children: Seq[Expression] = Seq(input, index)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
  override def prettyName: String = "graft_at"
}

/** expr-lang `v in xs` over a non-list operand: array membership, or
  * KEY membership for maps (`"k" in {"k": 1}` is true — the dialect
  * checks keys, Go-map style). */
case class PolyIn(item: Expression, collection: Expression)
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = collection.dataType match {
    case _: ArrayType => ArrayContains(collection, item)
    case _: MapType   => ArrayContains(MapKeys(collection), item)
    case t => throw new IllegalArgumentException(
      s"graft_in requires an array or map collection, got $t")
  }
  override def children: Seq[Expression] = Seq(item, collection)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1))
  override def prettyName: String = "graft_in"
}
