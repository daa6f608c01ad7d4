package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Sink SPI parity (`spi/sink/sink.go:26-51`, registry
  * `internal/eventing/sink/sinkmanager.go`): named sink factories with a
  * lifecycle, pluggable by config.
  *
  * Spark-first: built-in sinks (console, parquet, kafka) use native
  * `writeStream.format(...)` — exactly-once via checkpoint where the
  * format supports it. Everything else (the reference's NATS/Redis/
  * Kinesis/SQS/HTTP) plugs in as a `foreachBatch` emitter; retry with
  * exponential backoff mirrors `eventemitter.go:107,145-153` (8 tries).
  */
trait Sink extends Serializable {
  def name: String
  /** Emit one micro-batch. Must be idempotent — at-least-once delivery,
    * like the reference's ack-after-sink (`eventemitter.go:163`). */
  def emit(batch: DataFrame, batchId: Long): Unit
}

object Sinks {
  @volatile private var registry: Map[String, () => Sink] = Map(
    "console" -> (() => ConsoleSink),
    "null"    -> (() => NullSink)
  )

  def register(name: String, factory: () => Sink): Unit =
    synchronized { registry = registry + (name -> factory) }

  def create(name: String): Sink =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown sink: $name (have: ${registry.keys.mkString(",")})"))()

  /** Exponential-backoff retry wrapper (×8, like `eventemitter.go:107`). */
  def withRetry(sink: Sink, maxRetries: Int = 8, baseDelayMs: Long = 10): Sink =
    new Sink {
      def name: String = s"retry(${sink.name})"
      def emit(batch: DataFrame, batchId: Long): Unit = {
        var attempt = 0
        var done = false
        while (!done) {
          try { sink.emit(batch, batchId); done = true }
          catch {
            case e: Exception if attempt < maxRetries =>
              Thread.sleep(baseDelayMs << attempt)
              attempt += 1
            case e: Exception => throw e
          }
        }
      }
    }
}

object ConsoleSink extends Sink {
  def name = "console"
  def emit(batch: DataFrame, batchId: Long): Unit = batch.show(20, truncate = false)
}

object NullSink extends Sink {
  def name = "null"
  // forces full computation without materializing anywhere (bench sink)
  def emit(batch: DataFrame, batchId: Long): Unit = {
    batch.foreach((_: Row) => ())
  }
}

/** Parquet directory sink — append-mode, partitioned by topic like the
  * reference partitions by Kafka topic (`spi/stream/stream.go:61`). */
final case class ParquetSink(outDir: String) extends Sink {
  def name = "parquet"
  def emit(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("append").parquet(outDir)
}

/** Kafka sink — S9 (`internal/eventing/sink/kafka/kafka.go:40-125`).
  * Spark-first: the native `format("kafka")` streaming sink (exactly-once
  * per topic-partition with checkpointing + idempotent producer), not a
  * per-event client. Key/value columns must be the envelope JSON
  * (`Cdc.envelopeJson` provides both); topic from the naming strategy.
  * Config assembly mirrors the reference's SASL/TLS/idempotence knobs.
  */
final case class KafkaSinkConfig(
    bootstrapServers: String,
    idempotent: Boolean = false,
    saslMechanism: Option[String] = None,
    saslJaas: Option[String] = None,
    tls: Boolean = false) {
  def options: Map[String, String] = {
    val base = Map("kafka.bootstrap.servers" -> bootstrapServers)
    val idem = if (idempotent) Map("kafka.enable.idempotence" -> "true") else Map.empty
    val sasl = saslMechanism.map("kafka.sasl.mechanism" -> _).toMap ++
      saslJaas.map("kafka.sasl.jaas.config" -> _).toMap
    val sec = if (tls) Map("kafka.security.protocol" ->
      (if (saslMechanism.isDefined) "SASL_SSL" else "SSL"))
    else if (saslMechanism.isDefined) Map("kafka.security.protocol" -> "SASL_PLAINTEXT")
    else Map.empty[String, String]
    base ++ idem ++ sasl ++ sec
  }

  /** The exact frame the Kafka sink serializes: (topic, key, value) —
    * the wire contract of `format("kafka")`. Split out so the shape is
    * assertable without a broker. */
  def wirePlan(df: DataFrame): DataFrame =
    df.selectExpr("topic", "CAST(key AS STRING) AS key", "CAST(envelope AS STRING) AS value")

  /** Attach to a streaming envelope DataFrame carrying (topic, key,
    * envelope) columns. Caller starts the query with its checkpoint. */
  def writer(df: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    options.foldLeft(wirePlan(df).writeStream.format("kafka")) { case (w, (k, v)) => w.option(k, v) }
}

/** HTTP sink option assembly — S14
  * (`internal/eventing/sink/http/http.go:50-100`): authentication
  * none/basic/header, TLS skip-verify/client-auth. The header map is the
  * wire contract a POST emitter attaches per request; an unknown
  * authentication type fails loudly with the reference's wording. No
  * HTTP endpoint exists in this environment — the assembled headers and
  * the [[Sink]] delivery contract (`FileQueueSink` + retry) are the
  * testable surface.
  */
final case class HttpSinkConfig(
    url: String,
    authenticationType: String = "none",
    basicUsername: String = "",
    basicPassword: String = "",
    headerName: String = "",
    headerValue: String = "",
    tlsSkipVerify: Boolean = false) {
  def headers: Map[String, String] = authenticationType match {
    case "none" => Map.empty
    case "basic" =>
      val token = java.util.Base64.getEncoder.encodeToString(
        s"$basicUsername:$basicPassword".getBytes("UTF-8"))
      Map("Authorization" -> s"Basic $token")
    case "header" => Map(headerName -> headerValue)
    case other =>
      throw new IllegalArgumentException(s"http AuthenticationType '$other' doesn't exist")
  }
}

/** At-least-once queue-shaped sink over the filesystem — the testable
  * stand-in for the reference's HTTP/SQS/Kinesis emitters (no brokers
  * in this environment; the delivery CONTRACT is what's under test):
  *
  *   - each micro-batch lands as `batch=<id>/` in one distributed
  *     overwrite write — executors write, nothing funnels through the
  *     driver;
  *   - redelivery of a batch id (checkpoint replay after a crash
  *     between sink success and offset commit) OVERWRITES the same
  *     directory with identical content, so at-least-once delivery
  *     from the source becomes exactly-once in the queue — the same
  *     batch-id-keyed idempotence the reference gets from SQS
  *     deduplication ids (`README.md:444-447`);
  *   - transient failures (first `failFirst` attempts throw) are
  *     retried by `Sinks.withRetry`, mirroring ack-after-sink.
  */
final class FileQueueSink(dir: String, failFirst: Int = 0) extends Sink {
  def name = "file-queue"
  private val attempts = new java.util.concurrent.atomic.AtomicInteger()
  def emit(batch: DataFrame, batchId: Long): Unit = {
    if (attempts.incrementAndGet() <= failFirst)
      throw new RuntimeException(s"injected transient failure #${attempts.get}")
    batch.write.mode("overwrite").json(s"$dir/batch=$batchId")
  }
}

/** In-memory collector for tests — the EventCollectorSink analog
  * (`testsupport/sinks.go`). */
final class CollectorSink extends Sink {
  def name = "collector"
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
  def emit(batch: DataFrame, batchId: Long): Unit =
    synchronized { buf ++= batch.collect() }
  def rows: Seq[Row] = synchronized(buf.toSeq)
}
