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

  /** Total bytes of data files under `dir` (recursive, metadata-only).
    * `_`/`.`-prefixed names are skipped as FILES and as DIRECTORIES —
    * a streaming sink's `_spark_metadata/` log (whose inner files have
    * plain names) must not inflate the sizing. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(p: org.apache.hadoop.fs.Path): Boolean =
      p.getName.startsWith("_") || p.getName.startsWith(".")
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        if (hidden(st.getPath)) 0L
        else if (st.isDirectory) walk(st.getPath)
        else st.getLen
      }.sum
    walk(path)
  }

  /** Partition count targeting `targetBytes` per output file (≥1). */
  def targetPartitions(totalBytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

  /** Rewrite `inDir` (parquet) into `outDir` with files near
    * `targetBytes`. Repartition (one shuffle) by default: a coalesce
    * would push the partition merge BELOW the scan, serializing the
    * read+decode of thousands of small files into `target` tasks —
    * the classic compaction trap; the shuffle keeps the read at full
    * parallelism and only the write runs at `target`. Pass
    * `shuffle = false` only when the input partition count is already
    * small enough that a narrow merge can't starve the scan. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20, shuffle: Boolean = true): DataFrame = {
    val df = spark.read.parquet(inDir)
    val target = targetPartitions(dataBytes(spark, inDir), targetBytes)
    val sized = if (shuffle) df.repartition(target) else df.coalesce(target)
    sized.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
