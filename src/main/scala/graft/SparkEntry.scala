package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Cdc
import graft.model.Envelope

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry
  * (Spark) and, where SQL-expressible, an `oracleSql` entry (DuckDB).
  * Column names are aliased identically on both sides — the driver sorts
  * columns by name before hashing.
  *
  * Numeric discipline for oracle parity: double columns are cast to
  * DECIMAL at the leaves and aggregated in decimal arithmetic, which is
  * exact and engine-independent (double-sum association order is not).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full CDC hot path (SURVEY §3.1): WAL-shaped scan → broadcast
    * chunk→hypertable resolution → op gates → envelope projection.
    */
  def entry(spark: SparkSession): DataFrame =
    Cdc.envelopePipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- analytics: aggregation (Catalyst hash-agg, partial+final) ----
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- CDC: envelope projection (P1/P2 + §1.4 envelope, flattened) ----
    "cdc_envelope" -> ((s, dir) => {
      Cdc.walEvents(s, dir)
        .select(
          col("lsn"), col("xid"), col("op"), col("ts_ms"),
          col("schema_name"), col("table_name"),
          Envelope.topicName("graft", col("schema_name"), col("table_name")).as("topic"),
          col("event_id"), col("user_id"))
        .orderBy(col("lsn"))
    }),

    // ---- CDC: op gates (P3) ----
    "cdc_op_gates" -> ((s, dir) => {
      Cdc.opGate(Seq(Envelope.Op.Create, Envelope.Op.Update, Envelope.Op.Delete))(
        Cdc.walEvents(s, dir))
        .select(col("lsn"), col("op"))
        .orderBy(col("lsn"))
    }),

    // ---- CDC: chunk→hypertable resolution (J1, broadcast join) ----
    "cdc_chunk_resolution" -> ((s, dir) => {
      val resolved = Cdc.resolveHypertable(
        Cdc.walEvents(s, dir), Cdc.chunkCatalog(s, dir), Cdc.hypertableCatalog(s))
      resolved.groupBy(col("chunk_name"), col("ht_table"))
        .agg(count(lit(1)).as("n_events"), min(col("lsn")).as("min_lsn"), max(col("lsn")).as("max_lsn"))
        .orderBy(col("chunk_name"))
    }),

    // ---- CDC: high-watermark probe (S6/O2) ----
    "cdc_high_watermark" -> ((s, dir) => {
      Cdc.highWatermark(Cdc.walEvents(s, dir), Seq("event_id"))
        .select(col("event_id"), col("ts_ms"))
    }),

    // ---- dedup: exact (hash-groupBy) ----
    "dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("text_hash"))
    })
  )

  /** DuckDB-runnable oracle SQL, column-aliased identically to `queries`. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "cdc_envelope" ->
      """SELECT event_id AS lsn, event_id // 10 AS xid,
        |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'purchase' THEN 'u'
        |    WHEN 'error' THEN 'd' WHEN 'view' THEN 'r' ELSE 'm' END AS op,
        |  epoch_ns(ts) // 1000000 AS ts_ms,
        |  'public' AS schema_name, 'events' AS table_name,
        |  'graft.public.events' AS topic,
        |  event_id, user_id
        |FROM events ORDER BY lsn""".stripMargin,

    "cdc_op_gates" ->
      """SELECT event_id AS lsn,
        |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'purchase' THEN 'u'
        |    WHEN 'error' THEN 'd' WHEN 'view' THEN 'r' ELSE 'm' END AS op
        |FROM events
        |WHERE event_type IN ('signup','purchase','error')
        |ORDER BY lsn""".stripMargin,

    "cdc_chunk_resolution" ->
      """SELECT concat('_hyper_1_', CAST(chunk_day AS VARCHAR), '_chunk') AS chunk_name,
        |  'events' AS ht_table,
        |  COUNT(*) AS n_events, MIN(lsn) AS min_lsn, MAX(lsn) AS max_lsn
        |FROM (SELECT event_id AS lsn,
        |        epoch_ns(ts) // 86400000000000 - 19723 AS chunk_day
        |      FROM events)
        |GROUP BY chunk_name, ht_table
        |ORDER BY chunk_name""".stripMargin,

    "cdc_high_watermark" ->
      "SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events ORDER BY event_id DESC LIMIT 1",

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin
  )
}
