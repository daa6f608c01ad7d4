package graft.catalog

/** Replication-slot lifecycle + LSN acknowledgment —
  * `internal/replication/replicationconnection/replicationconnection.go:156-197`
  * (create-or-adopt, drop-only-if-created) and
  * `internal/replication/replicationcontext/replicationcontext.go:241-266`
  * (received/processed LSN tracking with monotonic-max acknowledgment).
  *
  * In Postgres the slot is server-side state (pg_replication_slots);
  * here it is the named durable cursor the streaming source resumes
  * from — the control-plane twin of the Structured Streaming
  * checkpoint. The rules carried over exactly:
  *   - `replicationslot.create` disabled + slot missing aborts startup
  *     (the reference returns an empty create and the subsequent
  *     StartReplication fails on the missing slot — one loud failure
  *     here rather than two steps later);
  *   - a pre-existing slot is ADOPTED: `created=false` and NO exported
  *     snapshot (only a fresh CREATE_REPLICATION_SLOT exports one —
  *     that snapshot is what fences the initial table scan against the
  *     stream, T4);
  *   - `dropReplicationSlot` drops ONLY when this process created the
  *     slot AND `replicationslot.autodrop` is set
  *     (`replicationconnection.go:184-187` — adopting never steals
  *     ownership);
  *   - processed-LSN acknowledgment is MONOTONIC MAX: a late or
  *     out-of-order ack can never move the restart point backwards
  *     (`replicationcontext.go:264-266`).
  */
final class ReplicationSlotManager(
    val slotName: String,
    val slotCreate: Boolean = true,
    val slotAutoDrop: Boolean = true,
    preExisting: Boolean = false) {

  private var existsFlag: Boolean = preExisting
  private var createdByUs: Boolean = false
  private var lastReceivedLsn: Long = 0L
  private var lastProcessedLsn: Long = 0L
  private var dropped = false

  def existsSlot: Boolean = existsFlag

  /** `CreateReplicationSlot` (`replicationconnection.go:156-181`):
    * returns (slotName, exportedSnapshotName, created). Adoption of an
    * existing slot yields no snapshot; create-disabled + missing slot
    * fails loudly instead of deferring the error to StartReplication. */
  def createReplicationSlot(): (String, String, Boolean) = {
    requireNotDropped()
    if (existsFlag) (slotName, "", false)
    else if (!slotCreate)
      throw new IllegalStateException(
        s"replication slot '$slotName' doesn't exist and replicationslot.create is disabled")
    else {
      existsFlag = true
      createdByUs = true
      // a fresh logical slot exports a snapshot usable to fence the
      // initial scan (CREATE_REPLICATION_SLOT ... EXPORT_SNAPSHOT)
      (slotName, s"graft_snapshot_$slotName", true)
    }
  }

  /** `AcknowledgeReceived` — the wire position after this frame. */
  def acknowledgeReceived(walEnd: Long): Unit = {
    requireExists(); lastReceivedLsn = walEnd
  }

  /** `AcknowledgeProcessed` — monotonic max, never regresses. */
  def acknowledgeProcessed(processedLsn: Long): Unit = {
    requireExists()
    if (processedLsn > lastProcessedLsn) lastProcessedLsn = processedLsn
  }

  def receivedLsn: Long = lastReceivedLsn

  /** The restart point a reconnect resumes from (confirmed flush). */
  def restartLsn: Long = lastProcessedLsn

  /** `DropReplicationSlot` (`replicationconnection.go:184-197`): only
    * a slot THIS process created is dropped, and only under autodrop;
    * adopted slots always survive shutdown. Returns whether dropped. */
  def dropReplicationSlot(): Boolean = {
    if (!createdByUs || !slotAutoDrop || dropped) false
    else { dropped = true; existsFlag = false; true }
  }

  private def requireExists(): Unit =
    if (!existsFlag) throw new IllegalStateException(
      s"replication slot '$slotName' does not exist")
  private def requireNotDropped(): Unit =
    if (dropped) throw new IllegalStateException(
      s"replication slot '$slotName' was dropped")
}
