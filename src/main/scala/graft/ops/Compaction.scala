package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output compaction — the small-files problem every long-running
  * pipeline hits at scale: a streaming sink or over-partitioned batch
  * write leaves thousands of KB-sized parquet files whose per-file open
  * cost dominates downstream scans. Compaction rewrites a dataset into
  * files near a target size.
  *
  * Sizing reads ONLY filesystem metadata (no data scan); the rewrite is
  * one narrow `coalesce` (no shuffle — partition merge), or an optional
  * `repartition` when going UP in parallelism (which does shuffle, and
  * is the right call when a few huge files serialize a downstream
  * stage). The reference has no analog (it streams row-by-row); this is
  * Spark-native operational surface a 100 TB deployment needs.
  */
object Compaction {

  /** Total bytes of data files under `dir` (recursive, metadata-only). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_") ||
                 st.getPath.getName.startsWith(".")) 0L
        else st.getLen
      }.sum
    walk(path)
  }

  /** Partition count targeting `targetBytes` per output file (≥1). */
  def targetPartitions(totalBytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

  /** Rewrite `inDir` (parquet) into `outDir` with files near
    * `targetBytes`. Narrow coalesce when shrinking the file count —
    * the common compaction direction — else a repartition. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    val df = spark.read.parquet(inDir)
    val current = df.rdd.getNumPartitions
    val target  = targetPartitions(dataBytes(spark, inDir), targetBytes)
    val sized =
      if (target <= current) df.coalesce(target)
      else df.repartition(target)
    sized.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
