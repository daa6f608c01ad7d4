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

/** Codegen'd feature-hash embedding kernel: the fused form of
  * `aggregate(transform(tokens, fnv), zeros, per-bucket ±1)` — the HOF
  * fold COPIES the dim-wide accumulator array once per token (HOF
  * lambdas are immutable per step), which is O(dim·tokens) allocations
  * on what should be the cheapest map-only stage of the pipeline. This
  * kernel accumulates into one local long[dim] per row and emits the
  * identical signed counts (bucket = low log₂(dim) bits of FNV-64a,
  * sign = the next bit), cast to float.
  */
case class HashEmbedVec(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 2 && (dim & (dim - 1)) == 0,
    s"hash_embed: dim=$dim must be a power of two")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash_embed requires array<string>, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    HashEmbedVec.compute(a.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashEmbedVec.compute($a, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashEmbedVec {
  /** Shared by eval and codegen: one virtual call per row, one local
    * accumulator, zero per-token allocation. */
  def compute(tokens: ArrayData, dim: Int): ArrayData = {
    val shift = java.lang.Integer.numberOfTrailingZeros(dim)
    val acc = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // null elements are skipped (concat_ws posture) — split() never
      // produces them, but hash_embed is a public function
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = FnvHash64.hash(t.getBytes)
        val bucket = (h & (dim - 1)).toInt
        acc(bucket) += 1L - (((h >>> shift) & 1L) << 1)
      }
      i += 1
    }
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat; j += 1 }
    new GenericArrayData(out)
  }
}

/** Unicode normalization (java.text.Normalizer) as a codegen scalar —
  * Spark ships no normalizer builtin, yet byte-level dedup keys are
  * wrong without one: the SAME text arrives both precomposed (NFC) and
  * decomposed (NFD, common from mac filesystems and some OCR/extraction
  * stacks), and hash-dedup then sees two distinct documents. Normalizing
  * to a canonical form before hashing is the standard first step of
  * exact dedup on web corpora.
  *
  * The ASCII fast path (`Normalizer.isNormalized` is O(n) with no
  * allocation, and true for all-ASCII) makes the common case nearly
  * free; only genuinely decomposed strings pay for re-composition.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  private val normForm = java.text.Normalizer.Form.valueOf(form) // fail at plan time

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string, got $t")
    }

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormalize.compute(s.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", normForm,
      classOf[java.text.Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeNormalize.compute($s, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge._
  def ngrams_join(tokens: Column, n: Int): Column =
    column(NGramsJoin(expression(tokens), n))
  def hash_embed(tokens: Column, dim: Int): Column =
    column(HashEmbedVec(expression(tokens), dim))
  def unicode_normalize(s: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(s), form))
}
