package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2 — transaction-window buffering as explicit streaming state
  * (`transactiontracker.go:128-189`, queue+drain `:441-524`).
  *
  * The reference buffers a transaction's events until COMMIT, bounded by
  * a 60 s deadline and a 10 000-entry max queue
  * (`transactiontracker.go:458-482`: `deadline.Before(now) → timedOut`,
  * `queueLength == maxSize → overflowed`, either → `drain()` and stream
  * subsequent entries straight through). This assembler mirrors both
  * bounds: per-xid state merges across micro-batches via
  * `flatMapGroupsWithState` with a processing-time timeout; state is
  * removed when the entry count reaches `maxSize` (overflow
  * stream-through — later events for the same xid start a fresh window,
  * exactly the reference's post-drain passthrough) and when the timeout
  * fires with no new events (the 60 s deadline). Without eviction the
  * state store grows with every xid ever seen — an OOM on a long stream.
  */
object TxnAssembler {

  /** Reference defaults (`transactiontracker.go` maxSize / timeout). */
  val DefaultMaxSize: Long = 10000L
  val DefaultTimeoutMs: Long = 60000L

  case class WalEv(lsn: Long, xid: Long, op: String, ts_ms: Long)
  case class TxnState(beginLsn: Long, commitLsn: Long, n: Long, commitTsMs: Long,
                      deadlineMs: Long)
  case class TxnSummary(xid: Long, begin_lsn: Long, commit_lsn: Long,
                        n_events: Long, commit_ts_ms: Long)

  /** State-merge step, parameterized by the transaction-window bounds.
    * `withTimeout=false` is used only under `GroupStateTimeout.NoTimeout`
    * (where `setTimeoutDuration` would throw).
    *
    * The time bound is a FIXED deadline from window open (reference:
    * `deadline: time.Now().Add(tt.timeout)` set once at transaction
    * start, checked per push — `transactiontracker.go:430-470`), not a
    * sliding idle timeout: a transaction trickling events slower than
    * the timeout still drains when its window expires.
    */
  def assemble(maxSize: Long, timeoutMs: Long, withTimeout: Boolean)(
      xid: Long, events: Iterator[WalEv],
      state: GroupState[TxnState]): Iterator[TxnSummary] = {
    if (!events.hasNext) {
      // Timeout callback: the deadline passed with no new events for
      // this xid — evict its window (reference: timedOut → drain).
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val evs = events.toSeq
      val nowMs =
        if (withTimeout) state.getCurrentProcessingTimeMs() else 0L
      val prev = state.getOption.getOrElse(
        TxnState(Long.MaxValue, Long.MinValue, 0L, 0L, nowMs + timeoutMs))
      val merged = TxnState(
        math.min(prev.beginLsn, evs.map(_.lsn).min),
        math.max(prev.commitLsn, evs.map(_.lsn).max),
        prev.n + evs.size,
        math.max(prev.commitTsMs, evs.map(_.ts_ms).max),
        prev.deadlineMs)
      if (merged.n >= maxSize || (withTimeout && nowMs >= merged.deadlineMs)) {
        // Overflow or expired window: stream through and drop the buffer
        // (reference: queueLength == maxSize → overflowed; deadline
        // passed → timedOut; either → drain).
        state.remove()
      } else {
        state.update(merged)
        // arm the callback for the REMAINING window, not a fresh period
        if (withTimeout) state.setTimeoutDuration(math.max(merged.deadlineMs - nowMs, 1L))
      }
      Iterator(TxnSummary(xid, merged.beginLsn, merged.commitLsn, merged.n, merged.commitTsMs))
    }
  }

  /** Streaming per-transaction summaries over the WAL stream, with the
    * reference's 10 000-entry / 60 s transaction-window bounds.
    *
    * TRIGGER CAVEAT: processing-time timers only fire on batches that
    * carry data, but a PENDING timer keeps `Trigger.AvailableNow`
    * scheduling empty batches forever — the query never terminates
    * (observed: 3 000+ no-data batches). Run this under the default
    * micro-batch trigger (a live CDC stream, where new data keeps
    * arriving and expires windows) or drain bounded replays with
    * `processAllAvailable()` + `stop()`. For a bounded replay that
    * needs no window timeout, use `assemble(withTimeout = false)`
    * under `GroupStateTimeout.NoTimeout` instead.
    */
  def txnStream(spark: SparkSession, dir: String,
                maxSize: Long = DefaultMaxSize,
                timeoutMs: Long = DefaultTimeoutMs): Dataset[TxnSummary] = {
    import spark.implicits._
    StreamPipeline.walStream(spark, dir)
      .selectExpr("lsn", "xid", "op", "ts_ms")
      .as[WalEv]
      .groupByKey(_.xid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        assemble(maxSize, timeoutMs, withTimeout = true))
  }
}
