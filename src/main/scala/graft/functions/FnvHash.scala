package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-64a hash — the exact function the reference uses to assign tables
  * to snapshot partitions (`internal/systemcatalog/snapshotting/
  * snapshotter.go:88,140-158`: FNV-64a of the canonical table name mod
  * partition count). Implemented as a codegen'd Catalyst expression so
  * partition assignment stays inside whole-stage codegen.
  *
  * offset basis 14695981039346656037, prime 1099511628211 (public FNV
  * constants); Java longs wrap exactly like Go's uint64 multiply.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv_hash64 requires string, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    FnvHash64.hash(a.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FnvHash64.hash($a.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FnvHash64 {
  final val OffsetBasis = -3750763034362895579L // 14695981039346656037 as signed
  final val Prime       = 1099511628211L

  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }

  def fnv_hash64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      FnvHash64(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Unsigned 64-bit remainder, matching Go's `uint64 % uint64`. Signed
    * pmod differs from it whenever the hash's top bit is set and n is not
    * a power of two, so it would mis-assign ~half of all table names. The
    * identity ((h >>> 1) % n * 2 + (h & 1)) % n stays in built-in codegen
    * expressions (no UDF). */
  def remainderUnsigned(h: Column, n: Long): Column = {
    import org.apache.spark.sql.functions._
    (shiftrightunsigned(h, 1) % n * 2 + h.bitwiseAND(1L)) % n
  }

  /** Snapshot partition assignment: FNV-64a(name) unsigned-mod n —
    * `snapshotter.go:140-158` (`hasher.Sum64() % uint64(n)`). */
  def snapshotPartition(name: Column, n: Int): Column =
    remainderUnsigned(fnv_hash64(name), n.toLong)

  /** The sampling keep-hash: FNV-64a("doc_<id>") unsigned-mod n — ONE
    * key recipe shared by every sampling op (and rendered identically
    * in their oracle twins), deterministic across retries and
    * partitionings. Keyed on doc_id, not content: re-ingested
    * duplicates sample identically only if they keep their id. */
  def keepHash(docId: Column, n: Int): Column =
    snapshotPartition(org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lit("doc_"), docId.cast("string")), n)

  /** keepHash in parts-per-million, for fractional keep rates. */
  def keepHashPpm(docId: Column): Column = keepHash(docId, 1000000)
}
