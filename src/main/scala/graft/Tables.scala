package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver's deterministic testdata
  * (TESTDATA.md). Every query takes an `sfDir` and reads through here so
  * filters/projections push down to the parquet scan (Catalyst handles
  * PushedFilters/ReadSchema pruning for free on these readers).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** `events.ts` has drifted across testdata generations: TIMESTAMP(NANOS)
    * parquet (which Spark 4 refuses by default, [PARQUET_TYPE_ILLEGAL] —
    * `nanosAsLong` reads it as Long nanos) vs timestamp[us]. Every
    * downstream consumer does exact integer epoch-NANOS arithmetic (the
    * DuckDB oracle uses `epoch_ns(ts)`, precision-agnostic), so normalize
    * any flavor to Long nanos here — the single choke point for the type.
    *
    * `inferTimestampNTZ=false` makes a no-tz micros column load as
    * TimestampType, whose internal value IS the raw stored micros
    * (no session-timezone shift on read), so `unix_micros(ts)*1000`
    * equals DuckDB's naive-as-UTC `epoch_ns` regardless of session tz.
    * Both confs are runtime-settable, per-session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    eventsConf(spark)
    normalizeTsNanos(t(spark, dir, "events"))
  }

  def eventsConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Rewrite `ts` to Long nanos-since-epoch whatever type it loaded as.
    * Works on batch and streaming DataFrames alike (pure projection). */
  def normalizeTsNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType      => df
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        // only reachable if a caller bypassed eventsConf; the NTZ→LTZ
        // cast reads the wall clock IN THE SESSION TIMEZONE, so it is
        // only exact under UTC — anything else would silently shift
        // every timestamp by the zone offset. Fail loud instead.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if (tz != "UTC") sys.error(
          s"events.ts loaded as TIMESTAMP_NTZ under session timezone $tz; " +
            "call Tables.eventsConf(spark) before reading (or set UTC)")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => sys.error(s"events.ts: unsupported parquet type $other")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
