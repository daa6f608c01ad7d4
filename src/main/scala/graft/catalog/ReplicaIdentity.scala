package graft.catalog

/** Startup replica-identity validation — the reference's
  * `internal/replication/replicator.go:250-311` (checkReplicaIdentities):
  * a table can only stream UPDATE/DELETE old-images if its replica
  * identity supports them. FULL always passes; INDEX needs a valid
  * replica index; DEFAULT needs a primary key. Continuous aggregates are
  * skipped (their materialization tables aren't user-streamed).
  *
  * This is a driver-side catalog pass (the catalog is DDL-sized), run
  * once before wiring the pipeline — same place the reference runs it.
  */
object ReplicaIdentity {
  val Default = "d"
  val Full    = "f"
  val Index   = "i"
  val Nothing = "n"

  final case class TableIdentity(
      canonicalName: String,
      replicaIdentity: String,
      hasPrimaryKey: Boolean,
      hasReplicaIndex: Boolean = false,
      isContinuousAggregate: Boolean = false)

  /** All issues, reference message wording (`replicator.go:268-281`). */
  def check(tables: Seq[TableIdentity]): Seq[String] =
    tables.flatMap { t =>
      if (t.isContinuousAggregate) None
      else if (t.replicaIdentity == Full) None
      else if (t.replicaIdentity == Index && !t.hasReplicaIndex)
        Some(s"Hypertable ${t.canonicalName} has replica identity INDEX, but no valid index")
      else if (t.replicaIdentity != Index && !t.hasPrimaryKey)
        Some(s"Hypertable ${t.canonicalName} has replica identity DEFAULT, but no valid primary key")
      else None
    }

  /** Fail-loud startup gate (`replicator.go:120-130` aborts on issues). */
  def validate(tables: Seq[TableIdentity]): Unit = {
    val issues = check(tables)
    if (issues.nonEmpty)
      throw new IllegalStateException(
        ("replica identity validation failed:" +: issues).mkString("\n  "))
  }
}
