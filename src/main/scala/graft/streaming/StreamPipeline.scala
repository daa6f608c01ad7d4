package graft.streaming

import graft.Tables
import graft.cdc.Cdc
import graft.model.Envelope
import graft.sinks.Sink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming path of the engine — SURVEY §2.9.
  *
  * The reference consumes the WAL over a replication socket
  * (`replicationhandler.go:115-215`), acks after sink success and
  * persists the restart LSN (`eventemitter.go:163`,
  * `replicationcontext.go:251-281`). The Spark shape:
  *
  *   - source: `readStream` over WAL-like batches (here: the events
  *     parquet; a real pgoutput `MicroBatchStream` slots in behind the
  *     same DataFrame contract — SURVEY §7.1 source strategy);
  *   - offsets/recovery (T1): the checkpoint directory IS the offset
  *     store — restart resumes exactly where the last committed batch
  *     ended, the analog of restart-LSN handling;
  *   - delivery: at-least-once into `foreachBatch` sinks (idempotent
  *     emitters), exactly-once for native file sinks;
  *   - ordering (T6): per-partition order preserved; global order
  *     relaxes to per-key order at scale, as documented in SURVEY §7.4.
  */
object StreamPipeline {

  /** Streaming WAL source: file-based micro-batches shaped like the
    * batch path (same `Cdc.shapeWal` stage — one code path to test).
    * `maxFilesPerTrigger` bounds batch size the way the reference bounds
    * its transaction window (`transactiontracker.go:458-482`).
    */
  def walStream(spark: SparkSession, dir: String): DataFrame = {
    Tables.eventsConf(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet") // source dir, events file only
      .parquet(dir)
    Cdc.shapeWal(Tables.normalizeTsNanos(stream))
  }

  /** Alternate streaming WAL source — BINARY pgoutput segment blobs
    * decoded executor-side (`Cdc.PgOutput`), shaped onto the same
    * columns `walStream` yields so the whole downstream pipeline is
    * source-agnostic. By default logical-message rows (no table, no
    * timestamp on the wire) are excluded here — they belong on the
    * message topic, not in chunk resolution; `keepMessages=true` (the
    * marker-mode arm) keeps them as op='m' rows with their decoded
    * `msg_prefix` and placeholder chunk_day/ts_ms, because the marker
    * tracker must consume the bracket prefixes before any event gate
    * (`transactiontracker.go:383-392`). ONE select shapes both forms —
    * the chunk-day epoch rule and the op mapping exist exactly once.
    * `chunk_day`/`ts_ms` derive from the decoded tuple exactly as
    * `Cdc.shapeWal` derives them from parquet.
    */
  def walStreamPgOutput(spark: SparkSession, segmentsPath: String,
                        typeResolver: graft.types.TypeRegistry.Resolver =
                          graft.types.TypeRegistry.Resolver.empty,
                        keepMessages: Boolean = false): DataFrame =
    graft.cdc.PgOutput.streamDecoded(spark, segmentsPath, typeResolver)
      .toDF()
      .filter(col("op_wire") =!= "T" &&
        (lit(keepMessages) || col("op_wire") =!= "M"))
      .select(col("lsn"), col("xid"),
        when(col("op_wire") === "M", lit("m"))
          .otherwise(graft.cdc.Cdc.opExpr(col("event_type"))).as("op"),
        col("schema_name"), col("table_name"),
        coalesce(expr(s"ts div ${graft.cdc.Cdc.NanosPerDay}")
            .minus(lit(graft.cdc.Cdc.EpochDay20240101)).cast("int"),
          lit(-1)).as("chunk_day"),
        coalesce(expr("ts div 1000000"), lit(0L)).as("ts_ms"),
        col("event_id"), col("user_id"), col("value"), col("props"),
        col("msg_prefix"))

  /** Full streaming envelope pipeline: shape → gates → envelope columns.
    * The chunk catalog is resolved against a *static* DataFrame — a
    * stream-static broadcast join, the Spark analog of the reference's
    * in-memory chunk cache (`containers/relationcache.go`).
    *
    * `pgoutputPath`: when set, the WAL comes from binary pgoutput
    * segment blobs instead of the parquet stand-in — the config surface
    * is `postgresql.pgoutput.path` (ConfigPipeline).
    */
  def envelopeStream(spark: SparkSession, dir: String,
                     enabledOps: Seq[String] = Envelope.Op.all,
                     pgoutputPath: Option[String] = None,
                     typeResolver: graft.types.TypeRegistry.Resolver =
                       graft.types.TypeRegistry.Resolver.empty,
                     markerSuppress: Boolean = false): DataFrame = {
    import spark.implicits._
    val raw = pgoutputPath.fold {
      // parquet stand-in: the fixture carries no per-row message
      // prefix (a live wire stream decodes it natively), and the
      // per-txn window derivation can't run on a streaming frame — so
      // derive it ONCE from the batch read and stream-static
      // BROADCAST-join it onto the op='m' rows by lsn. The static side
      // is message-rows-only (fixture-sized here; on a real deployment
      // this arm doesn't exist — the wire arm is the production path).
      val prefixes = Cdc.withMessagePrefix(Cdc.walEvents(spark, dir))
        .filter(col("op") === Envelope.Op.Message)
        .select(col("lsn"), col("msg_prefix"))
      walStream(spark, dir).join(broadcast(prefixes), Seq("lsn"), "left")
    } { path =>
      // one shaping definition for both wire forms: marker mode keeps
      // the 'M' frames through the TRACKER (they carry the bracket
      // prefixes; message rows drop again after it — the wire arm's
      // message topic is a separate surface), the default form
      // excludes them upstream so no row carries a prefix
      walStreamPgOutput(spark, path, typeResolver,
        keepMessages = markerSuppress)
    }
    // config-selected 2.12+ marker arm: P7 suppression via the keyed-
    // state tracker, between the WAL and chunk resolution — the
    // reference's transaction-tracker position. withTimeout=false here:
    // the config topology runs Trigger.AvailableNow, and a pending
    // processing-time timer keeps it scheduling empty batches forever
    // (TxnAssembler caveat); a continuous-trigger deployment calls
    // MarkerTracker.tracked directly with the window bounds on.
    val wal =
      if (!markerSuppress) raw
      else {
        val typed = raw.select(col("lsn"), col("xid"), col("op"),
            col("chunk_day").cast("int").as("chunk_day"), col("ts_ms"),
            col("msg_prefix"), col("event_id"), col("user_id"),
            col("value"), col("props"))
          .as[graft.streaming.MarkerTracker.WalRow]
        val kept = graft.streaming.MarkerTracker
          .tracked(typed, withTimeout = false).toDF()
          .filter(col("tsdb_op").isNull) // 'd' events ride the T3 arm
          .drop("tsdb_op", "n_suppressed")
        // wire-arm message rows leave the stream after the tracker
        if (pgoutputPath.isDefined)
          kept.filter(col("op") =!= Envelope.Op.Message)
        else kept
      }
    val resolved = wal
      .join(broadcast(Cdc.chunkCatalog(spark, dir)), Seq("chunk_day"))
      .join(broadcast(Cdc.hypertableCatalog(spark)), Seq("hypertable_id"))
    resolved
      .filter(col("op").isin(enabledOps: _*))
      .select(
        col("lsn"), col("xid"), col("op"), col("ts_ms"),
        col("ht_schema").as("schema_name"), col("ht_table").as("table_name"),
        col("chunk_name"),
        Envelope.topicName("graft", col("ht_schema"), col("ht_table")).as("topic"),
        col("event_id"), col("user_id"), col("value"), col("props"),
        col("msg_prefix"))
  }

  /** STREAM-STREAM interval join — the one Structured Streaming join
    * class the rest of the pipeline doesn't exercise: each purchase
    * joined to every preceding view by the same user within
    * `windowMs` (click/view attribution, the canonical use). Both
    * sides carry event-time watermarks and the join condition bounds
    * the time skew, so the state store provably evicts: a buffered
    * view older than watermark − window can never match a future
    * purchase and is dropped.
    *
    * One code path batch + streaming (`withWatermark` is a no-op on a
    * batch frame) — the batch form is the SQL-oracle-checked truth,
    * the StreamingSpec asserts stream ≡ batch row sets.
    */
  def streamStreamAttribution(wal: DataFrame, windowMs: Long = 3600000L): DataFrame = {
    val v = wal.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("lsn").as("view_lsn"),
        timestamp_millis(col("ts_ms")).as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val p = wal.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("lsn").as("purchase_lsn"),
        timestamp_millis(col("ts_ms")).as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    p.join(v, expr(
        s"""v_user = p_user AND v_ts <= p_ts AND
           |v_ts >= p_ts - INTERVAL ${windowMs / 1000} SECONDS""".stripMargin))
      .select(col("p_user").as("user_id"), col("purchase_lsn"), col("view_lsn"),
        unix_millis(col("p_ts")).as("purchase_ms"),
        unix_millis(col("v_ts")).as("view_ms"))
  }

  /** Event-time windowed aggregation with a watermark — the continuous-
    * aggregate analog (SURVEY §2.4 A2): hourly per-op counts over the
    * WAL stream. The watermark bounds state exactly like the reference
    * bounds its transaction window; late events beyond 10 minutes are
    * dropped (documented relaxation). `ts_ms` (epoch millis) lifts to a
    * real event-time column for watermarking.
    */
  def windowedStats(spark: SparkSession, dir: String): DataFrame =
    walStream(spark, dir)
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("op"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming deduplication on the event key with watermark-bounded
    * state — exactly-once delivery downstream of an at-least-once source
    * (the reference's SQS dedup-id pattern, `README.md:444-447`, as a
    * state-store op).
    */
  def dedupedStream(spark: SparkSession, dir: String): DataFrame =
    walStream(spark, dir)
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "1 hour")
      // dropDuplicatesWithinWatermark — plain dropDuplicates("lsn") never
      // evicts state (the watermark only purges when the event-time column
      // is part of the key), so a long-running stream grows unboundedly
      .dropDuplicatesWithinWatermark("lsn")

  /** Gap-based streaming sessionization with `session_window` — the
    * state-store-backed twin of the batch `Cdc.sessionize` (same 1h gap
    * semantics: a session closes when the next event is ≥ gap later).
    * Append mode emits a session once the watermark passes its close.
    */
  def sessionizedStream(spark: SparkSession, dir: String,
                        gap: String = "1 hour"): DataFrame =
    walStream(spark, dir)
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "10 minutes")
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("sess_start_ms"), max(col("ts_ms")).as("sess_end_ms"))
      .select(col("user_id"), col("n_events"),
        col("sess_start_ms"), col("sess_end_ms"))

  /** Run the pipeline into a pluggable sink with checkpointed recovery
    * (T1). `processAllAvailable` + `stop` gives the synchronous batch
    * drain used by tests; production callers use `awaitTermination`.
    */
  /** A1 — the reference's Prometheus counters
    * (`internal/stats/stats.go:35-100`) as observed metrics: per-batch
    * totals and per-op counts, surfaced in StreamingQueryProgress and
    * folded by [[StatsListener]] / scraped by [[StatsEndpoint]]. */
  def withStats(df: DataFrame): DataFrame =
    df.observe("graft_stats",
      count(lit(1)).as("n_events"),
      sum(when(col("op") === "c", 1).otherwise(0)).as("n_inserts"),
      sum(when(col("op") === "u", 1).otherwise(0)).as("n_updates"),
      sum(when(col("op") === "d", 1).otherwise(0)).as("n_deletes"),
      sum(when(col("op") === "t", 1).otherwise(0)).as("n_truncates"),
      sum(when(col("op") === "m", 1).otherwise(0)).as("n_messages"))

  /** The EMITTED counter observed separately, post-filter: the
    * reference counts channel calls at the replication handler
    * (pre-filter) and emitted events at the emitter (post-filter) —
    * two different plan points, two observe nodes. */
  def withEmitted(df: DataFrame): DataFrame =
    df.observe("graft_emitted", count(lit(1)).as("n_emitted"))

  def run(spark: SparkSession, dir: String, checkpointDir: String,
          sink: Sink, queryName: String = "graft-cdc"): StreamingQuery =
    withStats(envelopeStream(spark, dir))
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => sink.emit(batch, id))
      .trigger(Trigger.AvailableNow())
      .start()
}
