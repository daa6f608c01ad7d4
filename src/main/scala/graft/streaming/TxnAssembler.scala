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
  case class TxnState(beginLsn: Long, commitLsn: Long, n: Long, commitTsMs: Long)
  case class TxnSummary(xid: Long, begin_lsn: Long, commit_lsn: Long,
                        n_events: Long, commit_ts_ms: Long)

  /** State-merge step, parameterized by the transaction-window bounds.
    * `withTimeout=false` is used only under `GroupStateTimeout.NoTimeout`
    * (where `setTimeoutDuration` would throw).
    */
  def assemble(maxSize: Long, timeoutMs: Long, withTimeout: Boolean)(
      xid: Long, events: Iterator[WalEv],
      state: GroupState[TxnState]): Iterator[TxnSummary] = {
    if (!events.hasNext) {
      // Timeout callback: the 60 s deadline passed with no new events for
      // this xid — evict its window (reference: timedOut → drain).
      if (state.hasTimedOut) state.remove()
      Iterator.empty
    } else {
      val evs = events.toSeq
      val prev = state.getOption.getOrElse(TxnState(Long.MaxValue, Long.MinValue, 0L, 0L))
      val merged = TxnState(
        math.min(prev.beginLsn, evs.map(_.lsn).min),
        math.max(prev.commitLsn, evs.map(_.lsn).max),
        prev.n + evs.size,
        math.max(prev.commitTsMs, evs.map(_.ts_ms).max))
      if (merged.n >= maxSize) {
        // Overflow: stream through and drop the buffered window
        // (reference: queueLength == maxSize → overflowed → drain).
        state.remove()
      } else {
        state.update(merged)
        if (withTimeout) state.setTimeoutDuration(timeoutMs)
      }
      Iterator(TxnSummary(xid, merged.beginLsn, merged.commitLsn, merged.n, merged.commitTsMs))
    }
  }

  /** Streaming per-transaction summaries over the WAL stream, with the
    * reference's 10 000-entry / 60 s transaction-window bounds.
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
