package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T3, streaming arm — the chunk-status transition detector as keyed
  * streaming state (`transactiontracker.go:249-273` runs on the LIVE
  * replication stream; this is that shape in Structured Streaming).
  *
  * State is keyed by chunk: the value is the chunk's last seen status —
  * the streaming equivalent of the system catalog's cached
  * `chunk.Status()` that the batch form reads via `lag(new_status)
  * over (chunk, lsn)` (Cdc.statusTransitions; spec-proven equivalent in
  * StreamingSpec, including histories split mid-chunk across
  * micro-batches). Detection emits one row per `0→≠0` / `≠0→0`
  * transition with the 0x08 partial bit; the commit-time last-writer
  * aggregation (`Cdc.commitEmission`) runs downstream per micro-batch —
  * Spark permits one flatMapGroupsWithState per streaming query, and
  * the commit stage is a plain aggregation once transitions exist.
  *
  * Ordering contract: a chunk's updates arrive in LSN order across
  * batches (the WAL source's global contract, same assumption as every
  * LSN cursor in the repo); within a batch the group sorts by lsn.
  * State size is bounded by the chunk count — DDL volume, not data —
  * the same lifetime as the reference's in-memory catalog, so no
  * timeout eviction (NoTimeout) is the faithful posture.
  */
object CompressionTracker {

  case class StatusUpd(lsn: Long, xid: Long, chunk_id: Int, new_status: Int,
                       ts_ms: Long)
  case class Transition(lsn: Long, xid: Long, chunk_id: Int, new_status: Int,
                        kind: String, partial: Boolean, ts_ms: Long)
  case class ChunkStatus(last: Int)

  private[streaming] def detect(
      chunkId: Int, evs: Iterator[StatusUpd],
      state: GroupState[ChunkStatus]): Iterator[Transition] = {
    val sorted = evs.toArray.sortBy(_.lsn)
    var last = state.getOption.map(_.last).getOrElse(0)
    val out = sorted.flatMap { u =>
      val kind =
        if (last == 0 && u.new_status != 0) Some(graft.model.Envelope.TsdbOp.Compression)
        else if (last != 0 && u.new_status == 0) Some(graft.model.Envelope.TsdbOp.Decompression)
        else None
      last = u.new_status
      kind.map(k => Transition(u.lsn, u.xid, chunkId, u.new_status, k,
        (u.new_status & 8) == 8, u.ts_ms))
    }
    state.update(ChunkStatus(last))
    out.iterator
  }

  implicit private val updEnc: Encoder[StatusUpd] = Encoders.product[StatusUpd]
  implicit private val trEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit private val stEnc: Encoder[ChunkStatus] = Encoders.product[ChunkStatus]

  /** Transition stream over a (possibly streaming) status-update
    * Dataset. Append mode: a transition, once detected, is final. */
  def transitions(updates: Dataset[StatusUpd]): Dataset[Transition] =
    updates.groupByKey(_.chunk_id)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(detect)
}
