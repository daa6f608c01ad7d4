package graft

import graft.cdc.Cdc
import graft.sources.JdbcSideChannel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JDBC side channel against an in-JVM Derby database — the live-source
  * stand-in the harness sanctions (no Postgres available): catalog
  * discovery, snapshot-index resolution, fenced keyset snapshot, resume,
  * and byte-identical envelopes vs the file path.
  */
class JdbcSideChannelSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftspec;create=true"
  private val schema = "APP"

  /** events (sf0.001, ts normalized to Long nanos) loaded into Derby once. */
  private lazy val loaded: DataFrame = {
    val ev = Tables.events(spark, sf001) // ts already Long nanos
    JdbcSideChannel.withConnection(url) { c =>
      val st = c.createStatement()
      try st.execute("DROP TABLE EVENTS") catch { case _: java.sql.SQLException => }
      st.execute(
        """CREATE TABLE EVENTS (
          |  event_id BIGINT NOT NULL PRIMARY KEY,
          |  ts BIGINT, user_id BIGINT,
          |  event_type VARCHAR(32), value DOUBLE, props VARCHAR(512))"""
          .stripMargin.replace("\n", " "))
    }
    ev.write.mode("append").jdbc(url, "EVENTS", new java.util.Properties())
    ev
  }

  test("catalog discovery finds the table and its snapshot index") {
    loaded
    val tables = JdbcSideChannel.readTables(url, schema)
    assert(tables.exists(_.name.equalsIgnoreCase("events")))
    // PK = snapshot index, key-seq ordered (sidechannel.go:408-421 contract)
    assert(JdbcSideChannel.snapshotIndex(url, schema, "EVENTS")
      .map(_.toLowerCase) == Seq("event_id"))
    val cols = JdbcSideChannel.readTableSchema(url, schema, "EVENTS")
    assert(cols.map(_.name.toLowerCase).toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(cols.find(_.name.equalsIgnoreCase("event_id")).get.pkSeq == 1)
    assert(!cols.find(_.name.equalsIgnoreCase("event_id")).get.nullable)
  }

  test("fenced keyset snapshot returns every row exactly once, in parallel slices") {
    val ev = loaded
    val (snap, fence) = JdbcSideChannel.snapshot(
      spark, url, schema, "EVENTS", "EVENT_ID", parts = 8)
    assert(fence == 999L) // event_id 0..999
    assert(snap.rdd.getNumPartitions == 8)
    // default low = min-1, so the keyset (low, fence] covers every row
    assert(snap.count() == ev.count())
    // no dup, no gap across slice boundaries
    assert(snap.select("EVENT_ID").distinct().count() == ev.count())
  }

  test("envelopes from the JDBC path hash-match the file path") {
    loaded
    val (snap, _) = JdbcSideChannel.snapshot(
      spark, url, schema, "EVENTS", "EVENT_ID", lowWatermark = Some(-1L), parts = 8)
    // Derby upper-cases identifiers; renormalize then run the SAME shaping
    val lowered = snap.columns.foldLeft(snap)((d, c) => d.withColumnRenamed(c, c.toLowerCase))
    val viaJdbc = Cdc.shapeWal(lowered)
      .select(col("lsn"), Cdc.envelopeJsonCol().as("envelope"))
    val viaFile = Cdc.envelopeJson(spark, sf001).select(col("lsn"), col("envelope"))
    assert(viaJdbc.count() == viaFile.count())
    assert(viaJdbc.exceptAll(viaFile).isEmpty && viaFile.exceptAll(viaJdbc).isEmpty)
  }

  test("the fence excludes rows written after snapshot start; resume reads only the gap") {
    loaded
    val fence = JdbcSideChannel.readHighWatermark(url, schema, "EVENTS", "EVENT_ID").get
    // a writer appends while the snapshot runs
    JdbcSideChannel.withConnection(url) { c =>
      val ps = c.prepareStatement(
        "INSERT INTO EVENTS VALUES (?, 0, 0, 'view', 1.0, '{}')")
      (1000L to 1009L).foreach { id => ps.setLong(1, id); ps.executeUpdate() }
    }
    try {
      val (snap, usedFence) = JdbcSideChannel.snapshot(
        spark, url, schema, "EVENTS", "EVENT_ID",
        lowWatermark = Some(-1L), parts = 4, fenceOverride = Some(fence))
      assert(usedFence == fence)
      assert(snap.agg(max(col("EVENT_ID"))).head.getLong(0) == fence) // late rows fenced out
      // resume from the fence picks up EXACTLY the late rows (streaming phase analog)
      val (tail, _) = JdbcSideChannel.snapshot(
        spark, url, schema, "EVENTS", "EVENT_ID", lowWatermark = Some(fence), parts = 4)
      assert(tail.count() == 10)
      assert(tail.agg(min(col("EVENT_ID"))).head.getLong(0) == fence + 1)
    } finally JdbcSideChannel.withConnection(url) { c =>
      c.createStatement().execute("DELETE FROM EVENTS WHERE event_id > 999")
    }
  }

  test("keysetPredicates: half-open slices tile (low, high] with no overlap") {
    val preds = JdbcSideChannel.keysetPredicates("K", 0, 100, 7)
    assert(preds.length == 7)
    assert(preds.head.contains("> 0") && preds.last.contains("<= 100"))
    // never more slices than keys
    assert(JdbcSideChannel.keysetPredicates("K", 10, 13, 32).length == 3)
    assertThrows[IllegalArgumentException](
      JdbcSideChannel.keysetPredicates("K", 5, 5, 4))
  }
}
