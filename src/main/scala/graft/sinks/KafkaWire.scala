package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Minimal producer speaking the public Kafka wire protocol — the last
  * sink backend without a real client (`internal/eventing/sink/kafka/
  * kafka.go:100-125`: sarama SyncProducer, acks=WaitForAll, per-event
  * `StringEncoder` key/value on the topic). No client library exists in
  * this environment, so this speaks the documented protocol directly:
  * one `Produce` (api key 0, version 3) request per row chunk, records
  * packed as a message-format-v2 `RecordBatch` — varint/zigzag record
  * fields, CRC32C (JDK `java.util.zip.CRC32C`) over the
  * attributes..records span, acks=-1. A nonzero partition error code
  * throws, so `Sinks.withRetry` supplies sarama's retry semantics.
  *
  * Deliberate minimalism, documented: no Metadata round-trip (rows are
  * produced to partition 0 of the bootstrap broker — leader routing is
  * a multi-broker concern) and no InitProducerId (the reference's
  * `Idempotent(true)` stays config-level; delivery here is the same
  * at-least-once the rest of the sink family contracts). Expects string
  * columns (topic, key, envelope).
  */
final case class KafkaWireSink(
    bootstrap: String,
    clientId: String = "graft",
    timeoutMs: Int = 30000,
    maxBatchRecords: Int = 500,
    // SASL PLAIN (`kafka.go:53-66`, sarama SASLTypePlaintext): when a
    // username is set, every connection runs SaslHandshake(v1) +
    // SaslAuthenticate(v0) before its first Produce. Other mechanisms
    // (SCRAM, GSSAPI) stay native-path-only.
    saslUsername: String = "",
    saslPassword: String = "",
    // TLS (`kafka.go:66-77`, sarama Net.TLS): JDK SSLEngine over the
    // same socket path. skipVerify ≙ tls.Config.InsecureSkipVerify —
    // trust any chain, no hostname check (test/self-signed brokers);
    // the verified path uses the JVM default trust store WITH HTTPS
    // endpoint identification, sarama's default stance.
    tlsEnabled: Boolean = false,
    tlsSkipVerify: Boolean = false) extends Sink {
  def name = "kafka-wire"

  def emit(batch: DataFrame, batchId: Long): Unit = {
    val address = bootstrap
    val client  = clientId
    val timeout = timeoutMs
    val chunkSz = maxBatchRecords
    val (user, pass) = (saslUsername, saslPassword)
    val (tls, tlsSkip) = (tlsEnabled, tlsSkipVerify)
    batch.select("topic", "key", "envelope").foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {                  // empty partition: don't even dial
      val (host, port) = Sinks.hostPort(address, 9092)
      val sock: java.net.Socket =
        if (tls) KafkaWire.tlsSocket(host, port, tlsSkip)
        else new java.net.Socket(host, port)
      try {
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(sock.getOutputStream))
        val in  = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        var correlation = 0
        def roundTrip(req: Array[Byte]): Array[Byte] = {
          out.writeInt(req.length); out.write(req); out.flush()
          val respLen = in.readInt()
          val resp = new Array[Byte](respLen)
          in.readFully(resp)
          resp
        }
        if (user.nonEmpty) {
          correlation += 1
          KafkaWire.checkSaslHandshakeResponse(
            roundTrip(KafkaWire.saslHandshakeRequest(client, correlation)), correlation)
          correlation += 1
          KafkaWire.checkSaslAuthenticateResponse(
            roundTrip(KafkaWire.saslAuthenticateRequest(client, correlation, user, pass)),
            correlation)
        }
        rows.grouped(chunkSz).foreach { chunk =>
          val byTopic = chunk.groupBy(_.getAs[String]("topic")).toSeq.sortBy(_._1)
          correlation += 1
          val req = KafkaWire.produceRequest(client, correlation, timeout,
            byTopic.map { case (t, rs) =>
              t -> rs.map(r => (r.getAs[String]("key"), r.getAs[String]("envelope")))
            })
          KafkaWire.checkProduceResponse(roundTrip(req), correlation)
        }
      } finally sock.close()
      }
    }
  }
}

object KafkaWire {
  /** TLS client socket for the wire path (`kafka.go:66-77` analog).
    * skipVerify trusts any certificate and skips hostname checks —
    * sarama's InsecureSkipVerify; otherwise the platform trust store
    * plus HTTPS-rule endpoint identification (sarama's default
    * `tls.Config{}` verifies both). Handshake is forced eagerly so a
    * bad certificate fails HERE, not on the first Produce write.
    */
  def tlsSocket(host: String, port: Int, skipVerify: Boolean): javax.net.ssl.SSLSocket = {
    // one shared trust policy across wire sinks — Sinks.sslSocketFactory
    val s = Sinks.sslSocketFactory(skipVerify)
      .createSocket(host, port).asInstanceOf[javax.net.ssl.SSLSocket]
    if (!skipVerify) {
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
    }
    s.startHandshake()
    s
  }

  /** Zigzag varint (the protocol's signed variable-length integer). */
  def writeVarlong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }
  def writeVarint(out: java.io.ByteArrayOutputStream, v: Int): Unit =
    writeVarlong(out, v.toLong)

  private def writeShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt(out, (v >> 32).toInt); writeInt(out, v.toInt)
  }
  private def writeString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8"); writeShort(out, b.length); out.write(b)
  }

  /** One record in message-format v2: varint length prefix + body. */
  private def record(offsetDelta: Int, key: String, value: String): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write(0)                       // attributes
    writeVarlong(body, 0L)              // timestampDelta
    writeVarint(body, offsetDelta)
    if (key == null) writeVarint(body, -1)  // protocol null key
    else {
      val k = key.getBytes("UTF-8")
      writeVarint(body, k.length); body.write(k)
    }
    if (value == null) writeVarint(body, -1) // protocol null value (tombstone)
    else {
      val v = value.getBytes("UTF-8")
      writeVarint(body, v.length); body.write(v)
    }
    writeVarint(body, 0)                // headers
    val rec = new java.io.ByteArrayOutputStream()
    writeVarint(rec, body.size()); body.writeTo(rec)
    rec.toByteArray
  }

  /** RecordBatch v2: CRC32C covers attributes..records. */
  def recordBatch(records: Seq[(String, String)], timestampMs: Long): Array[Byte] = {
    val tail = new java.io.ByteArrayOutputStream()
    writeShort(tail, 0)                     // attributes (no compression)
    writeInt(tail, records.length - 1)      // lastOffsetDelta
    writeLong(tail, timestampMs)            // baseTimestamp
    writeLong(tail, timestampMs)            // maxTimestamp
    writeLong(tail, -1L)                    // producerId (non-idempotent)
    writeShort(tail, -1 & 0xffff)           // producerEpoch
    writeInt(tail, -1)                      // baseSequence
    writeInt(tail, records.length)
    records.zipWithIndex.foreach { case ((k, v), i) => tail.write(record(i, k, v)) }
    val tailBytes = tail.toByteArray
    val crc = new java.util.zip.CRC32C()
    crc.update(tailBytes)
    val out = new java.io.ByteArrayOutputStream()
    writeLong(out, 0L)                      // baseOffset
    writeInt(out, 9 + tailBytes.length)     // batchLength (after this field)
    writeInt(out, -1)                       // partitionLeaderEpoch
    out.write(2)                            // magic
    writeInt(out, crc.getValue.toInt)
    out.write(tailBytes)
    out.toByteArray
  }

  /** Produce v3 request (header v1 + body), ready for the 4-byte size
    * frame. Each topic's records go to partition 0. */
  def produceRequest(clientId: String, correlationId: Int, timeoutMs: Int,
      topics: Seq[(String, Seq[(String, String)])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeShort(out, 0)                      // api key: Produce
    writeShort(out, 3)                      // api version
    writeInt(out, correlationId)
    writeString(out, clientId)
    writeShort(out, -1 & 0xffff)            // transactional_id: null
    writeShort(out, -1 & 0xffff)            // acks: all (-1)
    writeInt(out, timeoutMs)
    writeInt(out, topics.length)
    topics.foreach { case (topic, records) =>
      writeString(out, topic)
      writeInt(out, 1)                      // one partition entry
      writeInt(out, 0)                      // partition 0
      val batch = recordBatch(records, System.currentTimeMillis())
      writeInt(out, batch.length)
      out.write(batch)
    }
    out.toByteArray
  }

  /** SaslHandshake v1 (api key 17): announce the PLAIN mechanism; the
    * broker refuses Produce on a SASL listener until this + the
    * authenticate round-trip succeed. */
  def saslHandshakeRequest(clientId: String, correlationId: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeShort(out, 17)                     // api key: SaslHandshake
    writeShort(out, 1)                      // version (v1 → auth via SaslAuthenticate)
    writeInt(out, correlationId)
    writeString(out, clientId)
    writeString(out, "PLAIN")
    out.toByteArray
  }

  def checkSaslHandshakeResponse(resp: Array[Byte], expectedCorrelation: Int): Unit = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(resp))
    val corr = in.readInt()
    if (corr != expectedCorrelation)
      throw new RuntimeException(s"kafka: sasl handshake correlation $corr != $expectedCorrelation")
    val err = in.readShort()
    if (err != 0)
      throw new RuntimeException(s"kafka: sasl handshake error code $err (mechanism rejected)")
  }

  /** SaslAuthenticate v0 (api key 36) with the RFC 4616 PLAIN token
    * `\0user\0password` as auth_bytes. */
  def saslAuthenticateRequest(clientId: String, correlationId: Int,
      username: String, password: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeShort(out, 36)                     // api key: SaslAuthenticate
    writeShort(out, 0)                      // version
    writeInt(out, correlationId)
    writeString(out, clientId)
    val token = ("\u0000" + username + "\u0000" + password).getBytes("UTF-8")
    writeInt(out, token.length)             // auth_bytes: BYTES
    out.write(token)
    out.toByteArray
  }

  def checkSaslAuthenticateResponse(resp: Array[Byte], expectedCorrelation: Int): Unit = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(resp))
    val corr = in.readInt()
    if (corr != expectedCorrelation)
      throw new RuntimeException(s"kafka: sasl auth correlation $corr != $expectedCorrelation")
    val err = in.readShort()
    if (err != 0) {
      val msgLen = in.readShort()
      val msg =
        if (msgLen > 0) { val b = new Array[Byte](msgLen); in.readFully(b); new String(b, "UTF-8") }
        else "authentication failed"
      throw new RuntimeException(s"kafka: sasl authenticate error $err: $msg")
    }
  }

  /** Parse a Produce v3 response; throw on correlation mismatch or any
    * nonzero partition error code. */
  def checkProduceResponse(resp: Array[Byte], expectedCorrelation: Int): Unit = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(resp))
    val corr = in.readInt()
    if (corr != expectedCorrelation)
      throw new RuntimeException(s"kafka: correlation $corr != $expectedCorrelation")
    val nTopics = in.readInt()
    (0 until nTopics).foreach { _ =>
      val nameLen = in.readShort()
      in.skipBytes(nameLen)
      val nParts = in.readInt()
      (0 until nParts).foreach { _ =>
        val partition = in.readInt()
        val errorCode = in.readShort()
        in.skipBytes(16)                    // baseOffset + logAppendTime
        if (errorCode != 0)
          throw new RuntimeException(s"kafka: partition $partition error code $errorCode")
      }
    }
  }
}
