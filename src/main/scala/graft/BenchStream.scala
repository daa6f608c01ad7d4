package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming-path throughput benchmark (the batch `Bench` never drives
  * Structured Streaming): runs the full CDC envelope stream — file
  * micro-batches → shape → stream-static broadcast chunk resolution →
  * op gates → Debezium envelope JSON — through `foreachBatch` with
  * AvailableNow, and prints ONE JSON line with events/s. This is the
  * number to hold against the reference's implied floor (≈48 ev/s from
  * its 1440-events-in-30-s snapshot test; BASELINE.md).
  *
  * `runMain graft.BenchStream [sfDir]`.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the WAL stand-in is ONE parquet file; default 128 MB split size
      // would render the whole batch on a single task. 256 KB splits ≙
      // the many-WAL-segment parallelism a production source has
      .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      // codegen falls back to interpreted expressions once a generated
      // method exceeds HotSpot's 8 KB JIT-compile limit (the 64 KB default
      // guards Janino, not the JIT): an un-JIT-able giant method runs as
      // interpreted BYTECODE, ~3x slower than Spark's interpreted
      // expression path on the wide conversion sweeps
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString

    // envelope JSON is materialized per event (count(envelope) forces the
    // full payload+schema rendering, not just row counting)
    def runOnce(tag: String): (Long, Double) = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamPipeline.envelopeStream(spark, sfDir)
        .select(graft.cdc.Cdc.envelopeJsonCol().as("envelope"))
        .writeStream
        .option("checkpointLocation", s"$ckpt/$tag")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(batch.filter(batch("envelope").isNotNull).count())
          (): Unit
        }
        .start()
      q.awaitTermination()
      (n.get(), (System.nanoTime() - t0) / 1e9)
    }

    // WIRE-path twin: raw pgoutput segment blobs → per-segment byte
    // decode (registry tuple decode, before/TOAST surfaces) → the full
    // envelope render. This is the rate a live replication-slot consumer
    // would run at once frames land as segment files.
    val segDir = s"$ckpt/segments"
    graft.cdc.PgOutput.encodeSegments(Tables.events(spark, sfDir))
      .write.mode("overwrite").parquet(segDir)
    def runWire(tag: String): (Long, Double) = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val q = graft.cdc.PgOutput.streamDecoded(spark, segDir).toDF()
        .filter(org.apache.spark.sql.functions.col("op_wire")
          .isin("I", "U", "D"))
        .select(graft.cdc.PgOutput.wireEnvelopeCol().as("envelope"))
        .writeStream
        .option("checkpointLocation", s"$ckpt/$tag")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(batch.filter(batch("envelope").isNotNull).count())
          (): Unit
        }
        .start()
      q.awaitTermination()
      (n.get(), (System.nanoTime() - t0) / 1e9)
    }

    // SOCKET phase: the same wire bytes served over a loopback v3
    // CopyBoth session — PgReplicationClient + PgWireTailer spool them
    // back into segment parquet (the live-slot ingestion chain,
    // single-reader socket → distributed decode). The server passes the
    // file-format inner frames through VERBATIM: the 'w'/'k' payloads
    // are wire-identical by construction.
    def runSocket(tag: String): (Long, Double) = {
      import java.io.{DataInputStream, DataOutputStream}
      val blobs = spark.read.schema(graft.cdc.PgOutput.frameSchema).parquet(segDir)
        .orderBy("segment").collect().map(_.getAs[Array[Byte]]("data"))
      val server = new java.net.ServerSocket(0)
      val serverThread = new Thread(() => {
        val s = server.accept()
        val in = new DataInputStream(new java.io.BufferedInputStream(s.getInputStream))
        val out = new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream, 1 << 16))
        def backend(t: Char, p: Array[Byte]): Unit = {
          out.writeByte(t); out.writeInt(4 + p.length); out.write(p)
        }
        // startup
        val len = in.readInt(); in.readFully(new Array[Byte](len - 4))
        backend('R', Array[Byte](0, 0, 0, 0)); backend('Z', Array('I'.toByte)); out.flush()
        // one query expected: START_REPLICATION (the bench skips IDENTIFY)
        val qt = in.read(); require(qt == 'Q', s"expected Q, got $qt")
        val ql = in.readInt(); in.readFully(new Array[Byte](ql - 4))
        backend('W', Array[Byte](0, 0, 0)); out.flush()
        blobs.foreach { blob =>
          val bb = java.nio.ByteBuffer.wrap(blob)
          while (bb.remaining() > 4) {
            val flen = bb.getInt
            val payload = new Array[Byte](flen); bb.get(payload)
            out.writeByte('d'); out.writeInt(4 + payload.length); out.write(payload)
          }
        }
        backend('c', Array.emptyByteArray); out.flush()
        // drain the client's acks until it hangs up
        try { while (in.read() >= 0) { val l = in.readInt(); in.readFully(new Array[Byte](l - 4)) } }
        catch { case _: Exception => () }
        s.close()
      })
      serverThread.setDaemon(true); serverThread.start()
      val spoolDir = s"$ckpt/$tag/spool"
      val t0 = System.nanoTime()
      // default ack cadence: the tailer confirms once per committed
      // segment, so the server hears a status update at every segment
      // boundary (plus keepalive replies and idle-timer acks)
      val c = new graft.sources.PgReplicationClient("127.0.0.1", server.getLocalPort,
        "rep", "bench")
      val nFrames = try {
        c.handshake()
        c.startReplication("bench_slot", "bench_pub", 0L)
        graft.sources.PgWireTailer.tail(spark, c, spoolDir, framesPerSegment = 100000)
        // frames spooled = what the decode fans out over
        graft.cdc.PgOutput.decodeSegments(
          spark.read.schema(graft.cdc.PgOutput.frameSchema).parquet(spoolDir))
          .filter(org.apache.spark.sql.functions.col("op_wire").isin("I", "U", "D"))
          .count()
      } finally { c.close(); server.close() }
      (nFrames, (System.nanoTime() - t0) / 1e9)
    }

    // COMPRESSION-TRACKER arm (T3 streaming): chunk-status updates
    // through the keyed-state detector (flatMapGroupsWithState — the
    // transactiontracker's live home) with commit-time emission run per
    // micro-batch downstream. The fixture's real status stream is
    // catalog-sized, so throughput is measured over a synthetic
    // high-volume status history derived from the events table (one
    // update per event, 512 chunks, per-chunk LSN order preserved by a
    // driver-side sort — the WAL source's global contract).
    def runTracker(tag: String): (Long, Long, Double) = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.CompressionTracker
      import graft.streaming.CompressionTracker.StatusUpd
      import org.apache.spark.sql.functions.col
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val updates = graft.cdc.Cdc.shapeWal(Tables.events(spark, sfDir))
        .select(col("lsn"), col("xid"),
          org.apache.spark.sql.functions.pmod(col("user_id"), org.apache.spark.sql.functions.lit(512))
            .cast("int").as("chunk_id"),
          org.apache.spark.sql.functions.expr(
            "cast(CASE WHEN lsn % 3 = 0 THEN 0 ELSE lsn % 9 + 1 END as int)")
            .as("new_status"),
          col("ts_ms"))
        .as[StatusUpd].collect().sortBy(_.lsn)
      val mem = MemoryStream[StatusUpd]
      val emitted = new java.util.concurrent.atomic.AtomicLong(0)
      val q = CompressionTracker.transitions(mem.toDS()).toDF()
        .writeStream
        .option("checkpointLocation", s"$ckpt/$tag")
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // commit-time emission over the batch's transitions; the
          // commit fence is the batch's own txn set (max lsn/ts per xid)
          emitted.addAndGet(graft.cdc.Cdc.commitEmission(b,
            b.select(col("xid"), col("lsn"), col("ts_ms"))).count())
          ()
        }
        .start()
      val t0 = System.nanoTime()
      updates.grouped(updates.length / 20 + 1).foreach { g =>
        mem.addData(g.toSeq); q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      (updates.length.toLong, emitted.get(), secs)
    }

    // cold pass pays session/codegen/JIT startup; the warm pass is the
    // steady-state number a long-lived CDC stream actually runs at —
    // report both, headline the warm rate (matching how the reference's
    // throughput would be read off a warmed replication slot)
    val (nCold, coldSecs) = runOnce("cold")
    val (nWarm, warmSecs) = runOnce("warm")
    val (nWireCold, wireColdSecs) = runWire("wire_cold")
    val (nWire, wireSecs) = runWire("wire_warm")
    val (nSockCold, sockColdSecs) = runSocket("sock_cold")
    val (nSock, sockSecs) = runSocket("sock_warm")
    val (nTrkCold, _, trkColdSecs) = runTracker("trk_cold")
    val (nTrk, nTrkEmitted, trkSecs) = runTracker("trk_warm")
    val rate     = if (warmSecs > 0) nWarm / warmSecs else 0.0
    val coldRate = if (coldSecs > 0) nCold / coldSecs else 0.0
    val wireRate = if (wireSecs > 0) nWire / wireSecs else 0.0
    val wireColdRate = if (wireColdSecs > 0) nWireCold / wireColdSecs else 0.0
    val sockRate = if (sockSecs > 0) nSock / sockSecs else 0.0
    val sockColdRate = if (sockColdSecs > 0) nSockCold / sockColdSecs else 0.0
    val trkRate = if (trkSecs > 0) nTrk / trkSecs else 0.0
    val trkColdRate = if (trkColdSecs > 0) nTrkCold / trkColdSecs else 0.0
    println(f"""{"metric":"stream_envelopes_per_sec","value":$rate%.1f,"unit":"events/sec","n_events":$nWarm,"wall_sec":$warmSecs%.2f,"cold_rate":$coldRate%.1f,"cold_wall_sec":$coldSecs%.2f,"wire_rate":$wireRate%.1f,"wire_n_events":$nWire,"wire_wall_sec":$wireSecs%.2f,"wire_cold_rate":$wireColdRate%.1f,"socket_rate":$sockRate%.1f,"socket_n_events":$nSock,"socket_wall_sec":$sockSecs%.2f,"socket_cold_rate":$sockColdRate%.1f,"tracker_rate":$trkRate%.1f,"tracker_n_updates":$nTrk,"tracker_n_emitted":$nTrkEmitted,"tracker_wall_sec":$trkSecs%.2f,"tracker_cold_rate":$trkColdRate%.1f,"sf":"$sfDir"}""")
    spark.stop()
    // every arm hard-fails on an empty run — a broken arm must not
    // report rate 0.0 under a green exit code
    if (nWarm == 0 || nWire == 0 || nSock == 0 ||
        nTrk == 0 || nTrkEmitted == 0) sys.exit(1)
  }
}
