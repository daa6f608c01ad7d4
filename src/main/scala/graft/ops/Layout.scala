package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout QUALITY and SKIPPING surface: the 2-D Morton fast path,
  * per-bucket extent reports, and zone-map data skipping. The general
  * n-column interleave and the file-rewrite op live in [[Compaction]]
  * (`zOrderValue`/`zOrderLayout`); this module adds what a pipeline
  * owner reads and what a scan planner prunes with.
  *
  * Why this matters at 100 TB: a single-column sort order can only make
  * ONE predicate selective at the file level. Interleaving the bits of
  * two (or more) key columns gives every file a small bounding box in
  * BOTH dimensions, so min/max zone maps prune files for predicates on
  * either column. This is the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` — re-expressed here as plain Catalyst integer
  * arithmetic so the key is codegen'd, shuffle-free to compute, and
  * bit-identical in DuckDB (the oracle runs the same shifts and masks).
  *
  * The reference engine has no layout surface (it streams row-by-row);
  * this module is Spark-native operational surface for the lakehouse
  * side of the pipeline.
  *
  * Everything is pure integer math:
  *   - no UDFs (shiftleft/bitwise ops stay inside WholeStageCodegen);
  *   - no floats (extents and keys hash-stably across engines);
  *   - the zone-map prune is an equi-semi-join on the bucket key against
  *     a broadcast candidate list — never a driver-side collect.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (the classic mask ladder, 4 steps of shift-or-mask). Input must
    * already be clamped to [0, 65536). */
  private def spread16(c: Column): Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** DuckDB twin of [[spread16]] over a SQL expression — same ladder,
    * BIGINT `<<`/`&`/`|` semantics match Spark's long ops exactly. */
  def spread16Sql(e: String): String = {
    val s1 = s"((($e) | (($e) << 8)) & 16711935)"
    val s2 = s"((($s1) | (($s1) << 4)) & 252645135)"
    val s3 = s"((($s2) | (($s2) << 2)) & 858993459)"
    s"((($s3) | (($s3) << 1)) & 1431655765)"
  }

  /** 2-D Morton key over `bits`-bit coordinates (bits ≤ 16): x occupies
    * even bit positions, y odd. Inputs are clamped into range with
    * `pmod` so arbitrary integer expressions are safe to feed.
    *
    * VALUE-IDENTICAL to [[Compaction.zOrderValue]]`(Seq(x, y), bits)`
    * on in-range inputs (spec-proven) — this is its 2-D fast path: the
    * mask ladder is ~10 integer ops total where the general n-column
    * form unrolls 2·bits shift/mask terms; use [[Compaction.zOrderLayout]]
    * to actually rewrite files by either key. */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"morton bits must be 1..16, got $bits")
    val m = lit(1L << bits)
    spread16(pmod(x, m)).bitwiseOR(shiftleft(spread16(pmod(y, m)), 1))
  }

  /** DuckDB twin of [[mortonKey]]. `x`/`y` are SQL expressions. */
  def mortonKeySql(x: String, y: String, bits: Int = 16): String = {
    val m = 1L << bits
    val px = s"((($x) % $m + $m) % $m)"
    val py = s"((($y) % $m + $m) % $m)"
    s"(${spread16Sql(px)} | (${spread16Sql(py)} << 1))"
  }

  /** Per-bucket layout report: bucket = top `log2(nBuckets)` bit-pairs
    * of the Morton key (an aligned power-of-4 quadrant grid — the
    * deterministic, SQL-expressible stand-in for "file"), with the
    * bucket's extent in each dimension and row count. The extent widths
    * are the quality metric: Z-clustered buckets have width
    * ≈ range/√nBuckets in BOTH dims; a 1-D sort has full-range width in
    * the second dim. */
  def zorderExtents(df: DataFrame, x: Column, y: Column,
                    bits: Int, quadBits: Int): DataFrame = {
    require(quadBits >= 1 && quadBits <= bits, "quadBits must be 1..bits")
    val m = lit(1L << bits)
    df.select(pmod(x, m).as("zx"), pmod(y, m).as("zy"),
        mortonKey(x, y, bits).as("zkey"))
      .groupBy(shiftright(col("zkey"), 2 * (bits - quadBits)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("min_x"), max(col("zx")).as("max_x"),
        min(col("zy")).as("min_y"), max(col("zy")).as("max_y"))
  }

  /** Zone map for `valueCol` over `bucket`: one (bucket, min, max, n)
    * row per bucket. At 100 TB this is the per-file footer-stats table —
    * catalog-sized (one row per file), cheap to keep hot. */
  def zoneMap(df: DataFrame, bucket: Column, valueCol: Column): DataFrame =
    df.groupBy(bucket.as("zm_bucket"))
      .agg(min(valueCol).as("zm_min"), max(valueCol).as("zm_max"),
        count(lit(1)).as("zm_n"))

  /** Data-skipping scan: filter `df` to `valueCol ∈ [lo, hi]` reading
    * only buckets whose zone-map interval intersects [lo, hi]. The
    * candidate bucket list is zone-map-sized → broadcast left-semi join
    * (never collected to the driver); the residual predicate re-applies
    * exactly, so the result is PROVABLY identical to the unpruned filter
    * — the oracle twin computes the plain filter and the hash match is
    * the losslessness proof. */
  def zoneMapPrunedFilter(df: DataFrame, bucket: Column, valueCol: Column,
                          zm: DataFrame, lo: Column, hi: Column): DataFrame = {
    val candidates = zm.filter(!(col("zm_max") < lo || col("zm_min") > hi))
      .select(col("zm_bucket"))
    df.withColumn("__bucket", bucket)
      .join(broadcast(candidates), col("__bucket") === col("zm_bucket"), "leftsemi")
      .drop("__bucket")
      .filter(valueCol >= lo && valueCol <= hi)
  }
}
