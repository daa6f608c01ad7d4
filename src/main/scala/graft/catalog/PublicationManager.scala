package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Publication lifecycle management —
  * `internal/publicationmanager/publicationmanager.go:35-110`, the
  * sidechannel publication queries
  * (`internal/sidechannel/queries.go:62-74`: CREATE / DROP IF EXISTS /
  * ALTER ... ADD TABLE / DROP TABLE), and the replicator's startup
  * partition of known tables into attach sets
  * (`internal/replication/replicator.go:352-427`).
  *
  * The publication itself is control-plane state (in Postgres it lives
  * in pg_publication / pg_publication_tables); here it is a
  * canonical-name set held by the manager with the same lifecycle
  * rules:
  *   - `exists` / `create` / `drop`; DROP has IF-EXISTS semantics —
  *     dropping a missing publication is NOT an error
  *     (`sidechannel.go:115-134` swallows UndefinedObject);
  *   - a publication is created only when `publication.create` is
  *     configured; missing + no-create fails loudly at startup;
  *   - a pre-existing publication is adopted as-is: its published set
  *     is read back, never recreated (`publication_test.go` reuse
  *     cases);
  *   - attach/detach are idempotent set operations keyed by canonical
  *     name (re-adding a published table is a no-op, like ALTER
  *     PUBLICATION ADD TABLE after a membership check,
  *     `publicationmanager.go:70-91`);
  *   - `publication.autoDrop` drops the publication on close
  *     (replicator shutdown path).
  *
  * The DATA-PLANE part — which tables still need attaching — is
  * DataFrame set algebra in [[PublicationManager.vanillaTablesToAttach]]
  * and [[PublicationManager.chunksToAttach]]: broadcast anti-joins on
  * canonical name with the reference's internal-schema partition rules.
  */
final class PublicationManager(
    val publicationName: String,
    val publicationCreate: Boolean = true,
    val publicationAutoDrop: Boolean = true,
    preExisting: Option[Set[String]] = None) {

  private var existsFlag: Boolean = preExisting.isDefined
  private var published: Set[String] = preExisting.getOrElse(Set.empty)
  private var closed = false

  /** Read-only probe — valid after close() so a shutdown path can be
    * observed (mutators stay guarded). */
  def existsPublication: Boolean = existsFlag

  /** `ReadPublishedTables` (`publicationmanager.go:93-95`). */
  def readPublishedTables: Seq[String] = { requireOpen(); published.toSeq.sorted }

  /** Startup wiring: adopt a pre-existing publication or create one —
    * missing + create-disabled aborts startup like the reference. */
  def ensurePublication(): Unit = {
    requireOpen()
    if (!existsFlag) {
      if (!publicationCreate)
        throw new IllegalStateException(
          s"publication '$publicationName' doesn't exist and publication.create is disabled")
      existsFlag = true
    }
  }

  /** CREATE PUBLICATION — returns whether it was newly created. */
  def createPublication(): Boolean = {
    requireOpen()
    if (existsFlag) false else { existsFlag = true; true }
  }

  /** DROP PUBLICATION IF EXISTS — missing is not an error. */
  def dropPublication(): Unit = {
    requireOpen()
    existsFlag = false
    published = Set.empty
  }

  def existsTableInPublication(canonicalName: String): Boolean = {
    requireOpen(); published.contains(canonicalName)
  }

  /** ALTER PUBLICATION ADD TABLE — idempotent; returns newly attached. */
  def attachTables(canonicalNames: Seq[String]): Seq[String] = {
    requireOpen(); requireExists()
    val fresh = canonicalNames.distinct.filterNot(published.contains)
    published ++= fresh
    fresh
  }

  /** ALTER PUBLICATION DROP TABLE — idempotent; returns detached. */
  def detachTables(canonicalNames: Seq[String]): Seq[String] = {
    requireOpen(); requireExists()
    val gone = canonicalNames.distinct.filter(published.contains)
    published --= gone
    gone
  }

  /** Shutdown: auto-drop when configured, then the manager is closed. */
  def close(): Unit = {
    if (!closed && publicationAutoDrop && existsFlag) dropPublication()
    closed = true
  }

  private def requireOpen(): Unit =
    if (closed) throw new IllegalStateException(
      s"publication manager for '$publicationName' is closed")
  private def requireExists(): Unit =
    if (!existsFlag) throw new IllegalStateException(
      s"publication '$publicationName' does not exist")
}

object PublicationManager {

  private val InternalSchemas = Seq("_timescaledb_internal", "_timescaledb_catalog")

  /** `replicator.go:352-389`: vanilla tables still to attach = known
    * tables anti-joined against the published set with the
    * TimescaleDB-internal schemas REMOVED from the published side first
    * (published chunks must not mask a vanilla table of the same name).
    * Broadcast: the published list is catalog-sized at any data scale. */
  def vanillaTablesToAttach(known: DataFrame, published: DataFrame): DataFrame = {
    val pub = published.filter(!col("schema_name").isin(InternalSchemas: _*))
    known.join(broadcast(pub.select("schema_name", "table_name")),
      Seq("schema_name", "table_name"), "left_anti")
  }

  /** `replicator.go:391-427`: chunks still to attach = known chunks
    * anti-joined against the published set RESTRICTED to
    * `_timescaledb_internal`. */
  def chunksToAttach(known: DataFrame, published: DataFrame): DataFrame = {
    val pub = published.filter(col("schema_name") === "_timescaledb_internal")
    known.join(broadcast(pub.select("schema_name", "table_name")),
      Seq("schema_name", "table_name"), "left_anti")
  }
}
