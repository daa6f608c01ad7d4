package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2 — transaction-window buffering as explicit streaming state
  * (`transactiontracker.go:128-189`, queue+drain `:441-524`).
  *
  * The reference buffers a transaction's events until COMMIT, with an
  * overflow relaxation (10 000 entries / 60 s window, then stream
  * through). Micro-batch Spark gives the same relaxation naturally:
  * per-xid state accumulates across batches via
  * `flatMapGroupsWithState`; a transaction whose events span batches is
  * merged in the state store; summaries flush per batch (the documented
  * stream-through bound — SURVEY §7.4).
  */
object TxnAssembler {

  case class WalEv(lsn: Long, xid: Long, op: String, ts_ms: Long)
  case class TxnState(beginLsn: Long, commitLsn: Long, n: Long, commitTsMs: Long)
  case class TxnSummary(xid: Long, begin_lsn: Long, commit_lsn: Long,
                        n_events: Long, commit_ts_ms: Long)

  def assemble(xid: Long, events: Iterator[WalEv],
               state: GroupState[TxnState]): Iterator[TxnSummary] = {
    val evs = events.toSeq
    if (evs.isEmpty) Iterator.empty
    else {
      val prev = state.getOption.getOrElse(TxnState(Long.MaxValue, Long.MinValue, 0L, 0L))
      val merged = TxnState(
        math.min(prev.beginLsn, evs.map(_.lsn).min),
        math.max(prev.commitLsn, evs.map(_.lsn).max),
        prev.n + evs.size,
        math.max(prev.commitTsMs, evs.map(_.ts_ms).max))
      state.update(merged)
      Iterator(TxnSummary(xid, merged.beginLsn, merged.commitLsn, merged.n, merged.commitTsMs))
    }
  }

  /** Streaming per-transaction summaries over the WAL stream. */
  def txnStream(spark: SparkSession, dir: String): Dataset[TxnSummary] = {
    import spark.implicits._
    StreamPipeline.walStream(spark, dir)
      .selectExpr("lsn", "xid", "op", "ts_ms")
      .as[WalEv]
      .groupByKey(_.xid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(assemble)
  }
}
