package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the zero-shuffle fact-to-fact join path
  * at 100 TB. Broadcast covers the DDL-sized dimension tables
  * (`Cdc.resolveHypertable`); when BOTH join sides are data-sized, the
  * scale answer is to land them bucketed on the join key: every
  * subsequent join (or aggregation) on that key reads already-co-located
  * buckets and Catalyst plans a SortMergeJoin with NO Exchange on either
  * side — the shuffle is paid once at write time, amortized over every
  * downstream query.
  *
  * (The reference is a pass-through streamer and never joins two fact
  * streams; this is part of the added training-data-pipeline surface,
  * where doc↔embedding or event↔session joins recur per run.)
  */
object Bucketing {

  /** Land a DataFrame bucketed+sorted on `key` as a catalog table.
    * `sortBy` makes each bucket file key-sorted, so the downstream
    * SortMergeJoin also skips its per-partition sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two tables previously landed with the SAME bucket count on
    * the join key — plans with zero Exchange operators. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
