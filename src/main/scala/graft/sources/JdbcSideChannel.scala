package graft.sources

import java.sql.{Connection, DriverManager, ResultSet}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC side channel — the live-database counterpart of the file-shaped
  * CDC path, closing the reference's "speaks SQL to a real server" seam
  * (`internal/sidechannel/sidechannel.go:380-523`,
  * `internal/sidechannel/queries.go:106-178`): catalog discovery,
  * snapshot-index resolution, high-watermark probe, and a fenced,
  * resumable, KEYSET-paginated snapshot.
  *
  * Division of labor (the part that matters at 100 TB):
  *  - catalog reads run DRIVER-side over one short-lived connection —
  *    they are catalog-sized (table/column counts scale with DDL, not
  *    rows), exactly like the reference's single side-channel session
  *    (`sidechannel.go:907-931`);
  *  - snapshot DATA reads run EXECUTOR-side via `spark.read.jdbc` with
  *    one keyset-range predicate per partition — N parallel connections
  *    each scanning `key > lo AND key <= hi`, the set-based form of the
  *    reference's `WhereTupleGT(low) AND WhereTupleLE(high)` cursor loop
  *    (`sidechannel.go:408-480`). No OFFSET anywhere: page starts stay
  *    O(1) regardless of table size, and a resume never re-reads.
  *
  * The fence (high watermark, `sidechannel.go:481-523`) is captured ONCE
  * before the scan and embedded in every partition predicate, so the
  * snapshot is a consistent keyset range even while writers append —
  * rows above the fence belong to the streaming phase
  * (`Cdc.snapshotWithFence`).
  */
object JdbcSideChannel {

  // keep Derby (and any embedded engine) scratch out of the repo tree
  if (sys.props.get("derby.system.home").isEmpty)
    sys.props("derby.system.home") = sys.props.getOrElse("java.io.tmpdir", "/tmp")

  case class JdbcTable(schema: String, name: String)
  /** pkSeq: 1-based position in the primary key, 0 = not a key column. */
  case class JdbcColumn(name: String, typeName: String, nullable: Boolean, pkSeq: Int)

  def withConnection[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** `ReadVanillaTables` analog (`sidechannel.go:227-246`): user tables
    * visible through JDBC metadata, filtered by schema pattern. */
  def readTables(url: String, schemaPattern: String = "%"): Seq[JdbcTable] =
    withConnection(url) { c =>
      val rs = c.getMetaData.getTables(null, schemaPattern, "%", Array("TABLE"))
      collect(rs)(r => JdbcTable(r.getString("TABLE_SCHEM"), r.getString("TABLE_NAME")))
    }

  /** `ReadVanillaTableSchema` analog (`sidechannel.go:302-316`,
    * `queries.go:130-178` shape): column name/type/nullability plus the
    * primary-key position — the snapshot index the keyset scan orders by
    * (`spi/systemcatalog/column.go:37-57`). */
  def readTableSchema(url: String, schema: String, table: String): Seq[JdbcColumn] =
    withConnection(url) { c =>
      val md = c.getMetaData
      val pks = collect(md.getPrimaryKeys(null, schema, table))(r =>
        r.getString("COLUMN_NAME") -> r.getInt("KEY_SEQ")).toMap
      collect(md.getColumns(null, schema, table, "%")) { r =>
        JdbcColumn(
          r.getString("COLUMN_NAME"),
          r.getString("TYPE_NAME"),
          r.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          pks.getOrElse(r.getString("COLUMN_NAME"), 0))
      }
    }

  /** Snapshot index: PK columns in key-sequence order. Empty ⇒ the table
    * has no keyset path (the reference falls back to its SCROLL-cursor
    * form there — `Cdc.snapshotScrollCursor` is the Spark analog). */
  def snapshotIndex(url: String, schema: String, table: String): Seq[String] =
    readTableSchema(url, schema, table).filter(_.pkSeq > 0).sortBy(_.pkSeq).map(_.name)

  /** High-watermark probe (`sidechannel.go:481-523`,
    * `queryTemplateSnapshotHighWatermark`): the MAX key value at snapshot
    * start — every snapshot predicate is fenced `key <= fence`. */
  def readHighWatermark(url: String, schema: String, table: String,
                        keyCol: String): Option[Long] =
    withConnection(url) { c =>
      val rs = c.createStatement().executeQuery(
        s"""SELECT MAX("$keyCol") FROM "$schema"."$table"""")
      if (rs.next() && rs.getObject(1) != null) Some(rs.getLong(1)) else None
    }

  /** Low end of the key range (for even partition bounds). */
  def readLowWatermark(url: String, schema: String, table: String,
                       keyCol: String): Option[Long] =
    withConnection(url) { c =>
      val rs = c.createStatement().executeQuery(
        s"""SELECT MIN("$keyCol") FROM "$schema"."$table"""")
      if (rs.next() && rs.getObject(1) != null) Some(rs.getLong(1)) else None
    }

  /** Keyset-range predicates over (low, high]: `parts` half-open slices,
    * each exactly the reference's `key > lo AND key <= hi` batch shape
    * (`sidechannel.go:425-447`). One predicate = one Spark partition =
    * one executor-side JDBC scan.
    *
    * Bounds are computed in BigInt: `high - low` and `span * i` both
    * overflow Long for snowflake-style 64-bit keys (span > 2^63/parts),
    * and an overflowed bound silently drops rows from a fenced snapshot.
    * The literals rendered into SQL are still in-Long-range because each
    * bound lies inside [low, high].
    *
    * `inclusiveLow` turns the FIRST slice into `key >= low`, used when the
    * table's minimum key is Long.MinValue and "min - 1" has no Long
    * representation. */
  def keysetPredicates(keyCol: String, low: Long, high: Long, parts: Int,
                       inclusiveLow: Boolean = false): Array[String] = {
    require(parts > 0, s"keysetPredicates: parts=$parts")
    require(high > low || (inclusiveLow && high >= low),
      s"keysetPredicates: empty range ($low, $high]")
    val bLow  = BigInt(low)
    val span  = BigInt(high) - bLow                        // exact, never overflows
    val n     = span.min(BigInt(parts)).max(BigInt(1)).toInt // never more slices than keys
    (0 until n).map { i =>
      val lo = bLow + span * i / n
      val hi = bLow + span * (i + 1) / n
      val op = if (i == 0 && inclusiveLow) ">=" else ">"
      s""""$keyCol" $op $lo AND "$keyCol" <= $hi"""
    }.toArray
  }

  /** Fenced, resumable snapshot (`FetchTableSnapshotBatch`,
    * `sidechannel.go:408-480`): reads `(lowWatermark, fence]` in `parts`
    * parallel keyset slices. Returns the frame and the fence it used, so
    * the caller can hand the fence to the streaming phase
    * (`Cdc.snapshotWithFence`) and persist it as the resume point.
    *
    * A resume after failure passes the last completed slice's upper
    * bound as `lowWatermark` — nothing below it is re-read (the
    * reference's SetLowWatermark-per-batch made exactly this contract).
    */
  def snapshot(spark: SparkSession, url: String, schema: String, table: String,
               keyCol: String, lowWatermark: Option[Long] = None,
               parts: Int = 32, fenceOverride: Option[Long] = None,
               fetchSize: Int = 0): (DataFrame, Long) = {
    val fence = fenceOverride.orElse(readHighWatermark(url, schema, table, keyCol))
      .getOrElse(throw new IllegalStateException(
        s"snapshot: $schema.$table is empty or $keyCol is all-NULL — nothing to fence"))
    // "min - 1" wraps to Long.MaxValue when the min key is Long.MinValue,
    // which would misread a non-empty table as fully caught up; saturate
    // by switching the first slice to an inclusive `>=` bound instead.
    val (low, inclusiveLow) = lowWatermark match {
      case Some(l) => (l, false)
      case None => readLowWatermark(url, schema, table, keyCol) match {
        case Some(Long.MinValue) => (Long.MinValue, true)
        case Some(m)             => (m - 1, false)
        case None                => (fence, false)
      }
    }
    val caughtUp = if (inclusiveLow) low > fence else low >= fence
    if (caughtUp) // fully caught up: empty frame with the right schema
      return (readJdbc(spark, url, schema, table,
        Array(s""""$keyCol" > $fence AND "$keyCol" <= $fence"""), fetchSize), fence)
    val preds = keysetPredicates(keyCol, low, fence, parts, inclusiveLow)
    (readJdbc(spark, url, schema, table, preds, fetchSize), fence)
  }

  private def readJdbc(spark: SparkSession, url: String, schema: String,
                       table: String, predicates: Array[String],
                       fetchSize: Int = 0): DataFrame = {
    val props = new java.util.Properties()
    // `postgresql.snapshot.batchsize` analog: rows per driver round-trip
    // within a slice (the reference's LIMIT-batch size; JDBC cursors
    // express it as fetchsize)
    if (fetchSize > 0) props.setProperty("fetchsize", fetchSize.toString)
    spark.read.jdbc(url, s""""$schema"."$table"""", predicates, props)
  }

  /** The pg_type bulk load the reference runs at STARTUP
    * (`internal/sidechannel/queries.go:36-63`
    * queryTemplateReadPostgreSqlTypes, consumed by
    * `internal/typemanager/typemanager.go:111-138` initialize): the
    * full type catalog in ONE catalog-sized query — name, kind, array
    * element, domain base, enum labels — so enum/domain/composite/array
    * columns resolve without per-OID round-trips mid-stream. Against a
    * live PostgreSQL the default SQL reads `pg_catalog.pg_type` with
    * the enum labels aggregated exactly like the reference's LEFT JOIN
    * on pg_enum; the harness overrides `sql` with the same column list
    * over its fixture table. Labels arrive either as a PG array literal
    * (`{a,b}`) or a plain comma-joined string — both parse. */
  val PgTypesQuery: String =
    """SELECT t.oid, t.typname, t.typtype, t.typelem, t.typbasetype, e.enum_values
      |FROM pg_catalog.pg_type t
      |LEFT JOIN (
      |  SELECT e.enumtypid, array_agg(e.enumlabel ORDER BY e.enumsortorder) AS enum_values
      |  FROM pg_catalog.pg_enum e GROUP BY 1
      |) e ON e.enumtypid = t.oid
      |WHERE t.typtype <> 'p'""".stripMargin

  def readPgTypes(url: String, sql: String = PgTypesQuery): Seq[graft.types.TypeRegistry.PgTypeRow] =
    withConnection(url) { c =>
      val rs = c.createStatement().executeQuery(sql)
      collect(rs) { r =>
        val labelsRaw = Option(r.getString("enum_values")).map(_.trim).getOrElse("")
        val labels: Seq[String] =
          if (labelsRaw.isEmpty) Nil
          else if (labelsRaw.startsWith("{"))
            graft.types.TypeRegistry.parseArrayText(labelsRaw, s => s)
              .collect { case s: String => s }
          else labelsRaw.split(",").toSeq.map(_.trim)
        // oid is UNSIGNED 32-bit in PostgreSQL: read as long and wrap to
        // the signed Int the wire path produces (pgoutput Relation
        // messages read oids with a signed getInt) — getInt here would
        // throw on a cluster whose oid counter passed 2^31, and an
        // unwrapped value would never match the wire-read registry key
        graft.types.TypeRegistry.PgTypeRow(
          r.getLong("oid").toInt, r.getString("typname"), r.getString("typtype").charAt(0),
          r.getLong("typelem").toInt, r.getLong("typbasetype").toInt, labels)
      }
    }

  /** [[readPgTypes]] as a [[graft.types.TypeRegistry.Resolver]]: the
    * startup-loaded map, with the lazy chain untouched as the fallback
    * for types created AFTER startup (the reference keeps the same
    * split — bulk load at `typemanager.go:111-138`, lazy registration
    * for mid-stream arrivals at `:236-323`). */
  def pgTypeResolver(url: String, sql: String = PgTypesQuery): graft.types.TypeRegistry.Resolver =
    graft.types.TypeRegistry.Resolver.ofMap(
      readPgTypes(url, sql).map(r => r.oid -> r).toMap)

  /** Catalog columns as a DataFrame, same shape as the parquet-path
    * `Cdc.catalogColumns` — lets one oracle check both channels. */
  def catalogColumnsDf(spark: SparkSession, url: String, schema: String,
                       table: String): DataFrame = {
    import spark.implicits._
    readTableSchema(url, schema, table)
      .map(c => (c.name.toLowerCase, c.typeName.toLowerCase, c.nullable, c.pkSeq))
      .toDF("column_name", "type_name", "nullable", "pk_seq")
  }

  /** Gate/test helper: the harness has no live Postgres, so the
    * driver-checkable JDBC path loads the deterministic events table
    * into an in-JVM Derby memory database — once per (JVM, dir),
    * thread-safe (Verify submits queries concurrently) — and snapshots
    * THROUGH the real side-channel machinery. Returns the JDBC url. */
  private val loadedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def derbyEventsUrl(spark: SparkSession, dir: String): String =
    loadedDirs.computeIfAbsent(dir, d => {
      // Full sanitized path, not a 31-bit hashCode: a hash collision between
      // two data dirs would silently serve one dir's events for the other.
      val db = "graftdb_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val url = s"jdbc:derby:memory:$db;create=true"
      withConnection(url) { c =>
        val st = c.createStatement()
        try st.execute("DROP TABLE EVENTS") catch { case _: java.sql.SQLException => }
        st.execute(
          "CREATE TABLE EVENTS (event_id BIGINT NOT NULL PRIMARY KEY, " +
            "ts BIGINT, user_id BIGINT, event_type VARCHAR(32), " +
            "value DOUBLE, props VARCHAR(512))")
      }
      graft.Tables.events(spark, d) // ts normalized to Long nanos
        .write.mode("append").jdbc(url, "EVENTS", new java.util.Properties())
      url
    })

  private def collect[A](rs: ResultSet)(f: ResultSet => A): Seq[A] = {
    val b = Seq.newBuilder[A]
    while (rs.next()) b += f(rs)
    rs.close()
    b.result()
  }
}
