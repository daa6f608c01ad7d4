package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T3/P7 (2.12+ marker path), streaming arm — the transaction tracker's
  * LIVE shape (`transactiontracker.go:383-392` runs on the replication
  * stream: `msg.Prefix == decompressionMarkerStartId` sets
  * `ongoingDecompression` on the ACTIVE transaction, the end id clears
  * it, and re-INSERTed rows arriving while the flag is set are
  * discarded, `:208-218`).
  *
  * State is keyed by xid: the value is the transaction's flag plus the
  * per-chunk suppressed-row tallies of the bracket in flight — the
  * streaming equivalent of the batch form's [[graft.cdc.Cdc]]
  * `withMarkerFlag` window (spec-proven equivalent in StreamingSpec,
  * including transactions split mid-bracket across micro-batches).
  * Sequential semantics by construction: several brackets per txn work,
  * inserts BETWEEN brackets survive, an end marker with no open bracket
  * is a plain message, a trailing start suppresses to txn end (the
  * reference's flag lives until commit).
  *
  * Output interleaves the two surfaces the batch flow computes
  * separately: surviving rows (`tsdb_op` null — markerSuppress's
  * contract: the marker messages themselves ride through as op='m'
  * rows) and one `tsdb_op='d'` event per (bracket, chunk) at the
  * closing marker's LSN with the suppressed count (markerDecompression's
  * contract; chunk identity resolves downstream through the J1 catalog
  * broadcast, exactly like the batch form).
  *
  * Ordering contract: a txn's rows arrive in LSN order across batches
  * (the WAL source's global contract); within a batch the group sorts
  * by lsn. State exists ONLY while a bracket is open or tallies are
  * pending (idle txns remove their entry at the end of the group call),
  * so the store is bounded by concurrently-open decompression
  * transactions — the reference's in-memory transaction window — and
  * NoTimeout matches that lifetime (a production deployment would add
  * the txn-window timeout T2 already enforces upstream).
  */
object MarkerTracker {

  case class WalRow(lsn: Long, xid: Long, op: String, chunk_day: Int,
                    ts_ms: Long, msg_prefix: Option[String])
  /** tsdb_op null ⇒ a surviving WAL row; tsdb_op='d' ⇒ a decompression
    * event at the closing marker (n_suppressed counts its bracket's
    * dropped re-inserts for that chunk). */
  case class MarkerOut(lsn: Long, xid: Long, op: String, chunk_day: Int,
                       ts_ms: Long, tsdb_op: Option[String], n_suppressed: Long)
  /** ongoing = the reference's per-txn ongoingDecompression flag;
    * counts: chunk → (suppressed rows, max ts) of the bracket in
    * flight. */
  case class TxnState(ongoing: Boolean, counts: Map[Int, (Long, Long)])

  private val Start = graft.cdc.Cdc.DecompressionMarkerStartId
  private val End   = graft.cdc.Cdc.DecompressionMarkerEndId

  private[graft] def track(
      xid: Long, rows: Iterator[WalRow],
      state: GroupState[TxnState]): Iterator[MarkerOut] = {
    val sorted = rows.toArray.sortBy(_.lsn)
    var st = state.getOption.getOrElse(TxnState(ongoing = false, Map.empty))
    val out = scala.collection.mutable.ArrayBuffer[MarkerOut]()
    def keep(r: WalRow): Unit =
      out += MarkerOut(r.lsn, r.xid, r.op, r.chunk_day, r.ts_ms, None, 0L)
    sorted.foreach { r =>
      r.msg_prefix match {
        case Some(Start) =>
          st = TxnState(ongoing = true, st.counts)
          keep(r)
        case Some(End) if st.ongoing =>
          // bracket closes: one 'd' event per suppressed chunk at the
          // closing marker's LSN, then the flag and tallies reset
          st.counts.toSeq.sortBy(_._1).foreach { case (chunk, (n, maxTs)) =>
            out += MarkerOut(r.lsn, xid, graft.model.Envelope.Op.Timescale,
              chunk, maxTs, Some(graft.model.Envelope.TsdbOp.Decompression), n)
          }
          st = TxnState(ongoing = false, Map.empty)
          keep(r)
        case _ if st.ongoing && r.op == graft.model.Envelope.Op.Create =>
          // a re-INSERTed decompression row: discard, tally
          val (n, ts) = st.counts.getOrElse(r.chunk_day, (0L, Long.MinValue))
          st = TxnState(ongoing = true,
            st.counts.updated(r.chunk_day, (n + 1, math.max(ts, r.ts_ms))))
        case _ => keep(r)
      }
    }
    // xid cardinality is DATA-sized (unlike CompressionTracker's
    // DDL-bounded chunk keys), so idle txns must not leave entries
    // behind: state exists ONLY while a bracket is open or tallies are
    // pending — the store's size is bounded by concurrently-open
    // decompression transactions, not by WAL history
    if (st.ongoing || st.counts.nonEmpty) state.update(st)
    else if (state.exists) state.remove()
    out.iterator
  }

  implicit private val rowEnc: Encoder[WalRow]   = Encoders.product[WalRow]
  implicit private val outEnc: Encoder[MarkerOut] = Encoders.product[MarkerOut]
  implicit private val stEnc: Encoder[TxnState]  = Encoders.product[TxnState]

  /** The tracked stream over a (possibly streaming) prefixed WAL
    * Dataset. Append mode: a suppression decision, once made, is final. */
  def tracked(rows: Dataset[WalRow]): Dataset[MarkerOut] =
    rows.groupByKey(_.xid)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(track)
}
