package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram kernel for the dedup/contamination operators.
  *
  * The composable formulation —
  * `transform(sequence(1, size(t)-n+1), i -> concat_ws(' ', element_at…))`
  * — evaluates its lambda interpreted, with a per-row sequence array
  * allocation and per-element expression-tree walks; shingling sits on
  * the hot side of every near-dup join, so that overhead multiplies by
  * corpus × tokens at 100 TB. This expression emits the exact same
  * grams (space-joined, order-preserving, empty when the doc is shorter
  * than n) as a fused loop inside whole-stage codegen.
  *
  * Same preference order as the vector kernels (SURVEY §7.3): built-ins
  * first, custom `Expression` when the bench demands.
  */
case class NGramsJoin(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngrams_join: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams_join requires array<string>, got $t")
    }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val total = math.max(arr.numElements() - (n - 1), 0)
    val out = new Array[AnyRef](total)
    // concatWs copies bytes, so one scratch buffer serves every gram
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val total = ctx.freshName("total")
      val grams = ctx.freshName("grams")
      val parts = ctx.freshName("parts")
      s"""
         |int $total = $a.numElements() - ${n - 1};
         |if ($total < 0) $total = 0;
         |UTF8String[] $grams = new UTF8String[$total];
         |UTF8String[] $parts = new UTF8String[$n];
         |for (int $i = 0; $i < $total; $i++) {
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $a.getUTF8String($i + $k);
         |  }
         |  $grams[$i] = UTF8String.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($grams);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge._
  def ngrams_join(tokens: Column, n: Int): Column =
    column(NGramsJoin(expression(tokens), n))
}
