package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary — the `freq_agg` / `topn_agg`
  * hyperfunction analog (TimescaleDB toolkit exposes SpaceSaver-family
  * frequency sketches over hypertables; same contract: bounded state,
  * mergeable partials, deterministic error bound).
  *
  * Spark-first shape: a [[TypedImperativeAggregate]] whose buffer is the
  * classic ≤`capacity`-counter Misra–Gries table. `update` is the
  * textbook step (hit → +1; room → insert; full → decrement-all round),
  * `merge` is the Agarwal et al. *Mergeable Summaries* rule: sum the two
  * tables, then subtract the (capacity+1)-th largest count from every
  * entry and drop the non-positive — so partial aggregation (map-side
  * combine) is exact-contract-preserving and the whole thing is ONE
  * shuffle of `capacity`-sized states, never of rows. At 100 TB this is
  * the difference between "top keys of a 10¹² -row column" being a
  * sketch-state exchange vs an unbounded groupBy.
  *
  * Error contract (carried IN the result, not in documentation): the
  * summary tracks `dec`, the total count subtracted from any single key
  * by decrement rounds/merges. For every key: `est ≤ true ≤ est + dec`,
  * and any key with `true > dec` is guaranteed present. `dec ≤ n /
  * (capacity + 1)` (each decrement round consumes `capacity + 1` units
  * of total weight). When the column's distinct count ≤ `capacity`, no
  * round ever fires, `dec == 0`, and every estimate is EXACT — which is
  * what makes the aggregate oracle-checkable: the driver gate runs it in
  * the exact regime against plain `GROUP BY` counts, and the inexact
  * regime is spec-bounded (FreqAggSpec in EventAnalyticsSpec).
  *
  * Determinism: `eval` sorts by (est desc, key), so in the exact regime
  * the output is partitioning-invariant byte-for-byte; in the inexact
  * regime only the (est, est+dec) interval is contractual.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  require(capacity > 0 && capacity <= 65536,
    s"freq_agg: capacity must be in [1, 65536], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_agg requires a string key, got $t")
    }

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(mutable.HashMap.empty, 0L, 0L)

  override def update(b: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      b.n += 1
      b.counts.get(key) match {
        case Some(c) => b.counts.update(key, c + 1)
        case None if b.counts.size < capacity => b.counts.update(key, 1L)
        case None =>
          // decrement-all round: the new key and `capacity` survivors
          // each give up one unit — capacity+1 units of weight per round,
          // which is exactly where the n/(capacity+1) bound comes from
          b.dec += 1
          val dead = mutable.ArrayBuffer.empty[String]
          b.counts.mapValuesInPlace((_, c) => c - 1)
          b.counts.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(b.counts.remove)
      }
    }
    b
  }

  override def merge(b: MisraGriesAgg.Buffer, o: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    o.counts.foreach { case (k, c) =>
      b.counts.update(k, b.counts.getOrElse(k, 0L) + c)
    }
    b.n += o.n
    b.dec += o.dec
    if (b.counts.size > capacity) {
      // Mergeable-summaries shrink: subtract the (capacity+1)-th largest
      // count from everything; ≤ capacity entries stay strictly positive
      val cut = b.counts.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      b.dec += cut
      val dead = mutable.ArrayBuffer.empty[String]
      b.counts.mapValuesInPlace((_, c) => c - cut)
      b.counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b.counts.remove)
    }
    b
  }

  override def eval(b: MisraGriesAgg.Buffer): Any = {
    val items = b.counts.toArray
      .sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
      }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(items.asInstanceOf[Array[Any]]), b.dec, b.n))
  }

  override def serialize(b: MisraGriesAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeLong(b.dec)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val dec = in.readLong()
    val sz = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      m.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    new MisraGriesAgg.Buffer(m, dec, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_agg"
}

object MisraGriesAgg {
  /** counts: surviving keys → decremented count; dec: total weight any
    * single key may have lost; n: rows observed (for the n/(k+1) bound). */
  final class Buffer(val counts: mutable.HashMap[String, Long],
                     var dec: Long, var n: Long)

  val resultType: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("dec", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Column-API front door: `freq_agg(col, capacity)`. */
  def freq_agg(key: Column, capacity: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MisraGriesAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(key), capacity)
        .toAggregateExpression())
}
