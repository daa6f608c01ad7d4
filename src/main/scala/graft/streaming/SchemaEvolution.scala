package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
