package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** In-memory collector for tests — the EventCollectorSink analog
  * (`testsupport/sinks.go`). Lives in the TEST tree on purpose: its
  * `batch.collect()` is a driver-side materialization no production
  * config should ever be able to name.
  */
final class CollectorSink extends Sink {
  def name = "collector"
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
  def emit(batch: DataFrame, batchId: Long): Unit =
    synchronized { buf ++= batch.collect() }
  def rows: Seq[Row] = synchronized(buf.toSeq)
}
