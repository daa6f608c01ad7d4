package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polymorphic length — the Catalyst twin of expr-lang's `len()`
  * builtin (strings, byte slices, arrays, maps), used by the event
  * filter translator (`eventfilter.go:73-83` compiles the full Expr
  * stdlib where `len` is type-dispatched). Spark's `length` covers only
  * string/binary and `size` only array/map; a filter condition can't
  * know the envelope field's type at parse time, so the dispatch lives
  * here, resolved at analysis and compiled statically (the child type
  * is known by codegen time — no per-row branching).
  */
case class PolyLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"len requires string, binary, array, or map input, got $t")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType   => v.asInstanceOf[UTF8String].numChars()
    case BinaryType   => v.asInstanceOf[Array[Byte]].length
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements()
    case _: MapType   => v.asInstanceOf[MapData].numElements()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType   => s"${ev.value} = $c.numChars();"
      case BinaryType   => s"${ev.value} = $c.length;"
      case _: ArrayType => s"${ev.value} = $c.numElements();"
      case _: MapType   => s"${ev.value} = $c.numElements();"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
