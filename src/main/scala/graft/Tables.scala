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
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
    * default ([PARQUET_TYPE_ILLEGAL]). Read it as Long nanos-since-epoch
    * — integer arithmetic downstream is then exact and engine-independent
    * (the DuckDB oracle uses epoch_ns). Set per-session, runtime-safe.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
