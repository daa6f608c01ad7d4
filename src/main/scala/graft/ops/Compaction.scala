package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) interleave of 2–4 non-negative integer columns:
    * bit i of column j lands at position `i·n + j`, so rows close in
    * EVERY dimension get close z-values — the standard multi-dimension
    * clustering key behind data-skipping layouts (a file sorted by
    * z-value has tight min/max ranges on ALL interleaved columns, so a
    * predicate on any of them prunes files; a plain sort only skips on
    * its leading column). Statically unrolled shift/mask terms — one
    * codegen projection, no UDF, engine-replicable integer math.
    *
    * Callers map skewed domains onto a bounded rank space first (only
    * the low `bits` bits interleave; negative inputs are a caller
    * error). */
  def zOrderValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zOrderValue interleaves 2-4 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 63,
      s"zOrderValue: ${cols.size} cols × $bits bits exceeds a long")
    val n = cols.size
    var z = lit(0L)
    for (i <- 0 until bits; (c, j) <- cols.zipWithIndex)
      z = z.plus(shiftleft(
        shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j))
    z
  }

  /** Cluster a dataset by z-value: range-repartition (sampled balanced
    * boundaries — the same mechanism as a global sort, but only the
    * boundary sample crosses the driver) + an in-partition sort, so
    * every output file covers one tight z-range. One shuffle; the sort
    * is partition-local. */
  def zOrderLayout(df: DataFrame, colNames: Seq[String], bits: Int = 16,
                   numPartitions: Int = 0): DataFrame = {
    val z = zOrderValue(colNames.map(df(_)), bits)
    val withZ = df.withColumn("__z", z)
    val parts =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parts.sortWithinPartitions("__z").drop("__z")
  }

  /** Scan-optimized parquet write — the footer-level levers a 100 TB
    * table lives or dies by, set explicitly instead of hoping at
    * defaults:
    *  - per-column BLOOM FILTERS (`parquet.bloom.filter.enabled#col`)
    *    for point-lookup columns: a reader probing `col = x` skips whole
    *    row groups without touching data pages — min/max stats can't do
    *    that for high-cardinality uniform keys, where every row group's
    *    range spans the predicate;
    *  - row-group sizing (`parquet.block.size`): bigger groups amortize
    *    footer overhead, smaller ones sharpen skipping granularity;
    *  - optional pre-sort on `sortCols` so min/max stats become
    *    disjoint ranges (the zone-map complement of the bloom lever —
    *    range predicates, where blooms are useless).
    * The write itself is one shuffle at most (the sort); everything
    * else is encoder configuration riding the normal parquet sink.
    */
  def writeOptimized(df: DataFrame, outDir: String,
                     bloomCols: Seq[String] = Nil,
                     sortCols: Seq[String] = Nil,
                     rowGroupBytes: Long = 128L * 1024 * 1024,
                     bloomNdv: Long = 1000000L): Unit = {
    require(rowGroupBytes >= 1024 * 1024,
      s"writeOptimized: rowGroupBytes=$rowGroupBytes below parquet sanity (1 MiB)")
    val sorted =
      if (sortCols.nonEmpty)
        df.repartitionByRange(sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df
    var w = sorted.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
    bloomCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
    }
    w.parquet(outDir)
  }

  /** Footer audit for [[writeOptimized]]: per column, whether every row
    * group carries a bloom filter and min/max statistics — the check a
    * layout CI job runs after a rewrite (a silently-disabled bloom
    * shows up as a full-scan regression weeks later). Reads ONLY
    * footers via the parquet API; never touches data pages.
    */
  def footerAudit(spark: SparkSession, dir: String,
                  cols: Seq[String]): Seq[(String, Boolean, Boolean)] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"footerAudit: no parquet files under $dir")
    cols.map { c =>
      var bloomAll = true
      var statsAll = true
      var matched = 0L // vacuous-pass guard: a typo'd column must FAIL, not pass
      files.foreach { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala
            .filter(_.getPath.toDotString == c)
            .foreach { cc =>
              matched += 1
              if (cc.getBloomFilterOffset < 0) bloomAll = false
              val st = cc.getStatistics
              if (st == null || !st.hasNonNullValue) statsAll = false
            }
        } finally reader.close()
      }
      if (matched == 0) (c, false, false) else (c, bloomAll, statsAll)
    }
  }
}
