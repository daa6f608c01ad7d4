package graft

import org.apache.spark.sql.streaming.Trigger

/** The custom DataSourceV2 WAL source: LSN offsets, windowed
  * micro-batches, restart recovery. */
class WalSourceSpec extends SparkSpec {

  private def readWal = spark.readStream
    .format("graft.sources.WalDataSource")
    .option("path", sf001)
    .option("batchSize", "300")
    .load()

  test("LSN-windowed micro-batches deliver the full WAL exactly once") {
    val q = readWal.writeStream.format("memory").queryName("wal_src")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val lsns = spark.sql("SELECT lsn FROM wal_src ORDER BY lsn")
      .collect().map(_.getLong(0))
    assert(lsns.length === 1000)
    assert(lsns.head === 0L && lsns.last === 999L)
    assert(lsns.distinct.length === 1000, "no duplicates across batch windows")
  }

  test("restart from checkpoint resumes at committed LSN (T1)") {
    val ckpt = java.nio.file.Files.createTempDirectory("wal-src-ckpt").toString
    val sink = new graft.sinks.CollectorSink
    def run(): Unit = {
      val q = readWal.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => sink.emit(b, id))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    assert(sink.rows.size === 1000)
    // second run, same checkpoint: offset log says lsn=1000 → nothing new
    run()
    assert(sink.rows.size === 1000, "no re-emission after restart")
  }

  test("range readers decode identically to the batch WAL path") {
    val q = readWal.writeStream.format("memory").queryName("wal_decode")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT lsn, xid, op, ts_ms, event_id, user_id, value, props FROM wal_decode ORDER BY lsn")
      .collect()
    val batch = graft.cdc.Cdc.walEvents(spark, sf001)
      .selectExpr("lsn", "xid", "op", "ts_ms", "event_id", "user_id", "value", "props")
      .orderBy("lsn").collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
  }

  test("restart recovery at sf0.1 with a heap-bounded driver (100k events)") {
    val ckpt = java.nio.file.Files.createTempDirectory("wal-src-ckpt-sf01").toString
    val sink = new graft.sinks.CollectorSink
    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.WalDataSource")
        .option("path", "/root/testdata/sf0.1")
        .option("batchSize", "20000")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => sink.emit(b, id))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
    }
    run()
    assert(sink.rows.size === 100000)
    run()
    assert(sink.rows.size === 100000, "no re-emission after restart")
  }
}
