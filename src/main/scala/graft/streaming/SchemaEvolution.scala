package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mid-stream schema evolution — the Spark shape of the reference's
  * `ApplySchemaUpdate` (`internal/systemcatalog/systemcatalog.go:347-373`
  * + `basetable.go:89-130` ApplyTableSchema, which diffs old vs new
  * column sets and logs the changes).
  *
  * Structured Streaming fixes the analyzed schema at plan time, so the
  * engine's contract (SURVEY §7.4) is **restart-on-DDL**: detect the
  * change, surface the diff, stop the query; the restart re-plans
  * against the new schema and resumes from the checkpointed offset —
  * the same observable behavior as the reference re-registering the
  * relation cache entry, minus in-flight replanning.
  */
object SchemaEvolution {

  sealed trait Change { def column: String }
  final case class Added(column: String, dataType: DataType) extends Change
  final case class Dropped(column: String, dataType: DataType) extends Change
  final case class TypeChanged(column: String, from: DataType, to: DataType) extends Change
  final case class NullabilityChanged(column: String, nowNullable: Boolean) extends Change
  final case class Renamed(column: String, to: String) extends Change

  /** Column-level diff, `basetable.go` ApplyTableSchema semantics:
    * positional rename detection (same type at same ordinal, new name),
    * otherwise added/dropped/type-changed. */
  def diff(old: StructType, next: StructType): Seq[Change] = {
    val oldByName = old.fields.map(f => f.name -> f).toMap
    val newByName = next.fields.map(f => f.name -> f).toMap
    val renames: Map[String, String] = old.fields.zipWithIndex.flatMap {
      case (f, i) =>
        if (!newByName.contains(f.name) && i < next.length &&
            !oldByName.contains(next(i).name) && next(i).dataType == f.dataType)
          Some(f.name -> next(i).name)
        else None
    }.toMap

    val dropped = old.fields.toSeq.collect {
      case f if !newByName.contains(f.name) && !renames.contains(f.name) =>
        Dropped(f.name, f.dataType)
    }
    val added = next.fields.toSeq.collect {
      case f if !oldByName.contains(f.name) && !renames.values.exists(_ == f.name) =>
        Added(f.name, f.dataType)
    }
    val renamed = renames.toSeq.map { case (from, to) => Renamed(from, to) }
    val changed = old.fields.toSeq.flatMap { f =>
      newByName.get(f.name).toSeq.flatMap { nf =>
        val t = if (nf.dataType != f.dataType)
          Seq(TypeChanged(f.name, f.dataType, nf.dataType)) else Nil
        val n = if (nf.nullable != f.nullable)
          Seq(NullabilityChanged(f.name, nf.nullable)) else Nil
        t ++ n
      }
    }
    dropped ++ added ++ renamed ++ changed
  }

  final class SchemaChangedException(val changes: Seq[Change])
      extends RuntimeException(
        s"schema changed (restart-on-DDL): ${changes.mkString(", ")}")

  /** foreachBatch guard: compare the batch's schema against the
    * registered one; fail loudly with the diff when DDL happened. The
    * stream's checkpoint makes the post-restart query resume exactly
    * after the last committed batch (T1), so no events are lost or
    * duplicated across the restart. */
  def schemaGuard(expected: StructType)(batch: DataFrame): DataFrame = {
    val changes = diff(expected, batch.schema)
    if (changes.nonEmpty) throw new SchemaChangedException(changes)
    batch
  }

  /** The envelope-row columns of a [[resolveBatch]] output — the
    * dynamic-decode meta columns stripped. */
  private val MetaCols =
    Set("segment", "lsn", "xid", "op_wire", "schema_name", "table_name")

  /** A resolved batch's ROW shape — what the Debezium `{schema}` block
    * describes for that batch. */
  def rowShape(wide: DataFrame): StructType =
    StructType(wide.schema.fields.filterNot(f => MetaCols(f.name)))

  /** Per-batch self-describing envelope schema — the reference rebuilds
    * each table's schema on `ApplySchemaUpdate` and every subsequent
    * envelope carries the NEW `{schema}` block (`eventschema.go:180-230`
    * built over the refreshed column set). Call this inside
    * `foreachBatch` on the [[resolveBatch]] output: the schema JSON is
    * a per-batch CONSTANT (one driver-side render, shipped as a `lit`
    * column), so a batch after the DDL describes the widened field set
    * while committed pre-DDL batches keep the shape they rendered. */
  def envelopeSchemaJsonFor(wide: DataFrame, topic: String): String =
    graft.model.DebeziumSchema.envelopeSchemaJson(rowShape(wide), topic)

  /** pgoutput type OID → the Spark type a dynamically-decoded text
    * value resolves to. Narrower than PgConverters' full matrix on
    * purpose: the dynamic surface types only what it can cast from the
    * raw wire text without a converter closure — everything else stays
    * a string column (lossless; a downstream converter can refine it).
    */
  def sparkTypeForOid(oid: Int): DataType = oid match {
    case 16                => BooleanType
    case 20 | 21 | 23 | 26 => LongType
    case 700 | 701         => DoubleType
    case 1700              => DecimalType(38, 18)
    case _                 => StringType
  }

  /** Least common SUPERTYPE of two dynamically-resolved column types —
    * the widening rule for a column whose oid changed mid-stream
    * (ALTER COLUMN TYPE). Numeric pairs widen within the numeric
    * tower; anything else widens to the raw-text supertype (lossless:
    * the wire carries text, and a downstream converter can refine). */
  private[streaming] def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (a, b) match {
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case (LongType, d: DecimalType)                       => d
      case (d: DecimalType, LongType)                       => d
      case (DoubleType, _: DecimalType)                     => DoubleType
      case (_: DecimalType, DoubleType)                     => DoubleType
      case _                                                => StringType
    }

  /** Per-micro-batch DYNAMIC schema resolution — the in-flight half of
    * the reference's `ApplySchemaUpdate` (`systemcatalog.go:347-373`):
    * a batch of [[graft.cdc.PgOutput.DynamicWal]] rows (whose tuples
    * ride as (name, oid, raw value) arrays because a mid-stream
    * Relation change means rows of DIFFERENT shapes share one batch)
    * resolves into a single WIDENED typed frame. Column order is
    * first-seen: the earliest relation version's order, with columns a
    * later version added appended — exactly the reference's diff
    * semantics ([[diff]]); rows that predate an added column carry NULL
    * for it, rows that postdate a drop likewise.
    *
    * A column re-announced with a NEW oid (ALTER COLUMN TYPE — the
    * [[TypeChanged]] case) is keyed on (name, oid): each row is cast by
    * the relation version IT arrived under (the row carries its
    * version's `col_oids`, so `element_at` reads the arriving oid — the
    * reference's per-relation-version decode, `decoderplan.go:32-101`),
    * then widened to the versions' common supertype LAST. Post-DDL
    * values can never be miscast through a stale type: an int8→text
    * flip yields a string column where pre-DDL longs render as their
    * decimal text and post-DDL text rides through verbatim.
    *
    * Run this inside `foreachBatch`: each micro-batch re-plans against
    * the schema IT observed, so the stream crosses a DDL boundary
    * without restart — batch N renders the old shape, batch N+1 the
    * widened one, and a parquet sink with schema merge (or any
    * column-mapped store) unions them. Cost shape: the schema-version
    * census is a groupBy over (col_names, col_oids) — DDL-bounded
    * cardinality, a driver-sized collect — and the projection itself is
    * one narrow, codegen'd select over the batch.
    */
  def resolveBatch(batch: DataFrame): DataFrame = {
    // ONE relation per resolve: schema versions are unioned by column
    // identity alone, so a multi-table batch would silently flatten two
    // tables into one cross-table frankenschema (a shared column name
    // with different OIDs takes the first-seen type for BOTH). Fail
    // loudly instead — a multi-table stream resolves per relation (the
    // caller splits on (schema_name, table_name); relation counts are
    // catalog-sized, so the census collect below stays trivial).
    val rels = batch.select(col("schema_name"), col("table_name"))
      .distinct().collect()
    require(rels.length <= 1,
      s"resolveBatch: one relation per resolve — batch carries ${rels.length}: " +
        rels.map(r => s"${r.getString(0)}.${r.getString(1)}").sorted.mkString(", "))
    // schema-version census in first-seen order (min lsn per version)
    val versions = batch
      .groupBy(col("col_names"), col("col_oids"))
      .agg(min(col("lsn")).as("__first_lsn"))
      .collect()
      .sortBy(_.getAs[Long]("__first_lsn"))
      // collection.Seq: collected rows hand back mutable array wrappers
      // in 2.13 — an immutable-Seq getAs would ClassCastException
      .map(r => r.getAs[scala.collection.Seq[String]]("col_names").toSeq
        .zip(r.getAs[scala.collection.Seq[Int]]("col_oids").toSeq))
    // union keyed on (name, oid): a name re-announced with a new oid
    // appends the oid as a fresh VERSION of the column, first-seen order
    val union = scala.collection.mutable.LinkedHashMap[String, Vector[Int]]()
    versions.foreach(_.foreach { case (n, oid) =>
      val seen = union.getOrElse(n, Vector.empty)
      if (!seen.contains(oid)) union(n) = seen :+ oid
    })
    val meta = Seq("segment", "lsn", "xid", "op_wire", "schema_name",
      "table_name").map(col)
    val typed = union.toSeq.map { case (name, oids) =>
      val pos = array_position(col("col_names"), lit(name))
      // element_at stays INSIDE the when-branch: CaseWhen evaluates the
      // value only when the guard holds, so a version without this
      // column (pos = 0) never trips ANSI's 1-based index check
      val raw = element_at(col("col_vals"), pos.cast("int"))
      val value =
        if (oids.size == 1) raw.cast(sparkTypeForOid(oids.head))
        else {
          // TypeChanged: cast by the ARRIVING version's oid, widen last
          val wide = oids.map(sparkTypeForOid).reduce(widen)
          val rowOid = element_at(col("col_oids"), pos.cast("int"))
          oids.foldLeft(lit(null).cast(wide)) { (acc, oid) =>
            when(rowOid === lit(oid),
              raw.cast(sparkTypeForOid(oid)).cast(wide)).otherwise(acc)
          }
        }
      when(pos > 0, value).as(name)
    }
    batch.select(meta ++ typed: _*)
  }
}
