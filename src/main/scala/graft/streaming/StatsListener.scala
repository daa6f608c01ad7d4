package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.concurrent.TrieMap

/** A1 observability — accumulates the engine's observed per-batch
  * metrics under the REFERENCE's metric names
  * (`replicationhandler.go:41-47`: total/insert/updates/deletes;
  * `eventemitter.go:51-54`: emitted.count), so dashboards built against
  * the reference's Prometheus surface read the same series here.
  *
  * Wiring: `StreamPipeline.run` attaches `observe("graft_stats", ...)`
  * to the envelope stream; this listener folds each batch's observed
  * row into monotone counters — the Spark twin of the reference's
  * stats engine reporting (`stats/reporter.go:30-36`).
  */
class StatsListener extends StreamingQueryListener {
  val counters = new TrieMap[String, Long]()

  private def add(k: String, v: Long): Unit =
    counters.updateWith(k) { c => Some(c.getOrElse(0L) + v) }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val om = e.progress.observedMetrics
    if (om.containsKey("graft_stats")) {
      val row = om.get("graft_stats")
      def long(name: String): Long =
        if (!row.schema.fieldNames.contains(name)) 0L
        else {
          val i = row.schema.fieldIndex(name)
          if (row.isNullAt(i)) 0L else row.getLong(i)
        }
      add("total", long("n_events"))
      add("insert", long("n_inserts"))
      add("updates", long("n_updates"))
      add("deletes", long("n_deletes"))
      add("truncates", long("n_truncates"))
      add("messages", long("n_messages"))
      // from the observed batch, NOT progress.sink.numOutputRows — the
      // foreachBatch sink reports -1 (no sink metrics), which would pin
      // the reference's emitted.count series at zero
      add("emitted.count", long("n_events"))
    }
  }
}
