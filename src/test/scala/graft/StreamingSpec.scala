package graft

import graft.sinks.CollectorSink
import graft.streaming.StreamPipeline
import java.nio.file.Files

/** Streaming-path parity: T1 offsets/recovery, envelope equivalence with
  * the batch path (reference restart semantics:
  * `/root/reference/tests/streamer_restart_test.go` — no loss across
  * restart; at-least-once into sinks). */
class StreamingSpec extends SparkSpec {

  test("streaming envelope equals batch envelope (one code path)") {
    val sink = new CollectorSink
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = StreamPipeline.run(spark, sf001, ckpt, sink)
    q.awaitTermination(120000)
    // A1: observed metrics surface the reference's stats counters
    val obs = q.lastProgress.observedMetrics.get("graft_stats")
    assert(obs.getAs[Long]("n_events") === 1000L)
    assert(obs.getAs[Long]("n_inserts") > 0L)
    val streamed = sink.rows.map(_.getAs[Long]("lsn")).sorted
    val batch = graft.cdc.Cdc.envelopePipeline(spark, sf001)
      .select("lsn").collect().map(_.getLong(0)).sorted
    assert(streamed.length === batch.length, "streaming and batch row counts equal")
    assert(streamed.sameElements(batch))
  }

  test("restart with same checkpoint emits nothing new (T1 recovery, no dupes)") {
    val sink = new CollectorSink
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    val q1 = StreamPipeline.run(spark, sf001, ckpt, sink, "graft-restart-1")
    q1.awaitTermination(120000)
    val afterFirst = sink.rows.size
    assert(afterFirst === 1000)
    // "restart": new query, same checkpoint — the committed offset makes
    // the already-processed file invisible, like resuming from stored LSN
    val q2 = StreamPipeline.run(spark, sf001, ckpt, sink, "graft-restart-2")
    q2.awaitTermination(120000)
    assert(sink.rows.size === afterFirst, "no events re-emitted after restart")
  }
}
