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
  * pending (idle txns remove their entry at the end of the group call)
  * — AND, because the xid keyspace is data-sized, an open entry is
  * bounded by the reference's T2 transaction window
  * (`transactiontracker.go:458-482`): a fixed deadline from bracket
  * open (60 s default) evicts a bracket whose end marker never arrives
  * (producer crash mid-txn), and a per-txn tally cap (10 000 default)
  * drains an oversized bracket. Either bound DRAINS the tallied state —
  * the pending 'd' events emit at the last-seen LSN and subsequent rows
  * stream through untracked, the reference's overflow relaxation
  * (`drain()` + passthrough). [[graft.streaming.TxnAssembler]] enforces
  * the same bounds upstream for whole-txn buffering; this tracker
  * enforces them on ITS OWN store so a deployment running the marker
  * flow alone is still eviction-safe.
  */
object MarkerTracker {

  /** The payload columns default to None so the tracker doubles as a
    * bare suppression kernel (specs, equivalence proofs) AND a
    * full-row pipeline stage (the config topology's marker arm, where
    * surviving rows continue into chunk resolution + envelope render
    * and must keep their tuple). */
  case class WalRow(lsn: Long, xid: Long, op: String, chunk_day: Int,
                    ts_ms: Long, msg_prefix: Option[String],
                    event_id: Option[Long] = None, user_id: Option[Long] = None,
                    value: Option[Double] = None, props: Option[String] = None)
  /** tsdb_op null ⇒ a surviving WAL row (payload + prefix intact);
    * tsdb_op='d' ⇒ a decompression event at the closing marker
    * (n_suppressed counts its bracket's dropped re-inserts for that
    * chunk; payload fields None). */
  case class MarkerOut(lsn: Long, xid: Long, op: String, chunk_day: Int,
                       ts_ms: Long, tsdb_op: Option[String], n_suppressed: Long,
                       msg_prefix: Option[String] = None,
                       event_id: Option[Long] = None, user_id: Option[Long] = None,
                       value: Option[Double] = None, props: Option[String] = None)
  /** ongoing = the reference's per-txn ongoingDecompression flag;
    * counts: chunk → (suppressed rows, max ts) of the bracket in
    * flight; lastLsn = where a drained bracket's events emit;
    * deadlineMs = the FIXED transaction-window deadline, set once when
    * the entry is created (reference: `deadline: time.Now().Add(
    * tt.timeout)` at txn start, not a sliding idle timeout);
    * nSuppressed = running whole-bracket tally, kept incrementally so
    * the overflow-cap check is O(1) per row instead of re-summing the
    * per-chunk map. NOTE: any field change here changes the
    * flatMapGroupsWithState state-store schema — a checkpoint written
    * by an older TxnState shape will not restart against this encoder
    * (Spark state-schema validation fails loudly); drain the stream
    * (close brackets / let the window expire) before upgrading, or
    * restart from a fresh checkpoint. */
  case class TxnState(ongoing: Boolean, counts: Map[Int, (Long, Long)],
                      lastLsn: Long = 0L, deadlineMs: Long = 0L,
                      nSuppressed: Long = 0L)

  private val Start = graft.cdc.Cdc.DecompressionMarkerStartId
  private val End   = graft.cdc.Cdc.DecompressionMarkerEndId

  /** Drain the bracket in flight: the pending per-chunk tallies emit as
    * 'd' events at `atLsn` (reference `drain()` — the buffered decision
    * streams out rather than vanishing). */
  private def drain(xid: Long, st: TxnState, atLsn: Long): Seq[MarkerOut] =
    st.counts.toSeq.sortBy(_._1).map { case (chunk, (n, maxTs)) =>
      MarkerOut(atLsn, xid, graft.model.Envelope.Op.Timescale,
        chunk, maxTs, Some(graft.model.Envelope.TsdbOp.Decompression), n)
    }

  /** State step, parameterized by the T2 transaction-window bounds.
    * `withTimeout=false` runs under `GroupStateTimeout.NoTimeout`
    * (bounded replays / direct TestGroupState calls, where
    * `setTimeoutDuration` would throw). */
  private[graft] def track(timeoutMs: Long, maxSuppressed: Long,
                           withTimeout: Boolean)(
      xid: Long, rows: Iterator[WalRow],
      state: GroupState[TxnState]): Iterator[MarkerOut] = {
    if (!rows.hasNext) {
      // Timeout callback: the window deadline passed with no end marker
      // — evict, draining the tallied state (reference: timedOut →
      // drain; a lost end marker must not pin the entry forever)
      if (state.hasTimedOut && state.exists) {
        val st = state.get
        state.remove()
        return drain(xid, st, st.lastLsn).iterator
      }
      return Iterator.empty
    }
    val sorted = rows.toArray.sortBy(_.lsn)
    val nowMs = if (withTimeout) state.getCurrentProcessingTimeMs() else 0L
    var st = state.getOption.getOrElse(TxnState(ongoing = false, Map.empty))
    // self-heal the running tally from the per-chunk map when a state
    // arrives without it (hand-built in specs, or any constructor that
    // skipped the field): one O(chunks) pass per batch per key keeps
    // the per-row cap check O(1)
    if (st.nSuppressed == 0L && st.counts.nonEmpty)
      st = st.copy(nSuppressed = st.counts.valuesIterator.map(_._1).sum)
    val out = scala.collection.mutable.ArrayBuffer[MarkerOut]()
    // expired window met by NEW data on the same trigger: drain first,
    // then stream the fresh rows through (post-drain passthrough)
    if (withTimeout && state.exists && nowMs >= st.deadlineMs) {
      out ++= drain(xid, st, st.lastLsn)
      st = TxnState(ongoing = false, Map.empty)
    }
    def keep(r: WalRow): Unit =
      out += MarkerOut(r.lsn, r.xid, r.op, r.chunk_day, r.ts_ms, None, 0L,
        r.msg_prefix, r.event_id, r.user_id, r.value, r.props)
    sorted.foreach { r =>
      r.msg_prefix match {
        case Some(Start) =>
          val deadline =
            if (st.ongoing || st.counts.nonEmpty) st.deadlineMs
            else nowMs + timeoutMs // window opens HERE, fixed from open
          st = TxnState(ongoing = true, st.counts, r.lsn, deadline,
            st.nSuppressed)
          keep(r)
        case Some(End) if st.ongoing =>
          // bracket closes: one 'd' event per suppressed chunk at the
          // closing marker's LSN, then the flag and tallies reset
          out ++= drain(xid, st, r.lsn)
          st = TxnState(ongoing = false, Map.empty)
          keep(r)
        case _ if st.ongoing && r.op == graft.model.Envelope.Op.Create =>
          // a re-INSERTed decompression row: discard, tally
          val (n, ts) = st.counts.getOrElse(r.chunk_day, (0L, Long.MinValue))
          st = TxnState(ongoing = true,
            st.counts.updated(r.chunk_day, (n + 1, math.max(ts, r.ts_ms))),
            r.lsn, st.deadlineMs, st.nSuppressed + 1)
          if (st.nSuppressed >= maxSuppressed) {
            // overflow: drain and stream subsequent rows through
            // untracked (queueLength == maxSize → overflowed → drain)
            out ++= drain(xid, st, r.lsn)
            st = TxnState(ongoing = false, Map.empty)
          }
        case _ => keep(r)
      }
    }
    // xid cardinality is DATA-sized (unlike CompressionTracker's
    // DDL-bounded chunk keys), so idle txns must not leave entries
    // behind: state exists ONLY while a bracket is open or tallies are
    // pending — the store's size is bounded by concurrently-open
    // decompression transactions, each further bounded by the window
    if (st.ongoing || st.counts.nonEmpty) {
      state.update(st)
      // arm the callback for the REMAINING window, not a fresh period
      if (withTimeout)
        state.setTimeoutDuration(math.max(st.deadlineMs - nowMs, 1L))
    } else if (state.exists) state.remove()
    out.iterator
  }

  /** NoTimeout convenience step (bounded replays + the TestGroupState
    * specs) — identical decisions minus the window clock. */
  private[graft] def track(
      xid: Long, rows: Iterator[WalRow],
      state: GroupState[TxnState]): Iterator[MarkerOut] =
    track(TxnAssembler.DefaultTimeoutMs, TxnAssembler.DefaultMaxSize,
      withTimeout = false)(xid, rows, state)

  implicit private val rowEnc: Encoder[WalRow]   = Encoders.product[WalRow]
  implicit private val outEnc: Encoder[MarkerOut] = Encoders.product[MarkerOut]
  implicit private val stEnc: Encoder[TxnState]  = Encoders.product[TxnState]

  /** The tracked stream over a (possibly streaming) prefixed WAL
    * Dataset. Append mode: a suppression decision, once made, is final.
    * Defaults carry the reference's transaction-window bounds; pass
    * `withTimeout=false` for bounded replays that must not leave a
    * pending processing-time timer (see TxnAssembler's trigger caveat:
    * a pending timer keeps `Trigger.AvailableNow` scheduling empty
    * batches forever). */
  def tracked(rows: Dataset[WalRow],
              timeoutMs: Long = TxnAssembler.DefaultTimeoutMs,
              maxSuppressed: Long = TxnAssembler.DefaultMaxSize,
              withTimeout: Boolean = true): Dataset[MarkerOut] =
    rows.groupByKey(_.xid)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(
        track(timeoutMs, maxSuppressed, withTimeout))
}
