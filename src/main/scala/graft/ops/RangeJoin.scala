package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/point range joins that survive scale.
  *
  * Spark plans a bare `p.ts BETWEEN i.lo AND i.hi` join predicate as a
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons with
  * no partition parallelism on the probe side. The standard remedy
  * (binning; the same trick range-join hints hardcode in engines that
  * ship them natively) turns it into an equi-join: explode each
  * interval into the fixed-width time bins it covers, key each point by
  * its bin, equi-join on the bin, then apply the BETWEEN as a residual
  * filter. Each point is compared only against intervals sharing its
  * bin — work scales with genuine overlap density, not the cross
  * product — and the equi-join shuffles/broadcasts like any other.
  *
  * Reference analog: the stream/snapshot LSN fence and as-of alignment
  * (`replicationresolver.go` family) are one-sided range predicates;
  * this is the two-sided generalization a consumer needs for
  * time-window enrichment.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them.
    *
    * `binWidth` is in the shared unit of `ptCol`/`loCol`/`hiCol`
    * (pick ≈ the typical interval length: too small multiplies
    * interval rows, too large multiplies residual comparisons).
    * `maxBinsPerInterval` fails loudly when an outlier interval would
    * explode into pathological row counts (the skew guard — a single
    * year-long interval at minute bins is a plan bug, not data).
    *
    * Output: every (interval ⋈ point) pair with all columns of both
    * inputs (caller aliases collisions away first). Inner join: a
    * point in no interval, or an empty interval, contributes nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, loCol: String, hiCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"pointInInterval: binWidth=$binWidth must be positive")
    val nBins = expr(s"$hiCol div $binWidth - $loCol div $binWidth + 1")
    // the guard rides INSIDE the bin computation (a dropped side column
    // would be pruned by Catalyst and never fire)
    val lowBin = when(nBins > maxBinsPerInterval,
        raise_error(concat(lit(s"pointInInterval: interval spans more than " +
          s"$maxBinsPerInterval bins of width $binWidth ("),
          nBins, lit(" bins) — widen binWidth"))))
      .otherwise(expr(s"$loCol div $binWidth"))
    val binned = intervals
      .withColumn("__bin",
        explode(sequence(lowBin, expr(s"$hiCol div $binWidth"))))
    points
      .withColumn("__bin", expr(s"$ptCol div $binWidth"))
      .join(binned, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** 2-D radius join (the spatial sibling of [[pointInInterval]]):
    * all (a, b) pairs within euclidean `radius`, coordinates in exact
    * integer micro-units. Grid cells of side `radius`; the RIGHT side
    * replicates into its 3×3 cell neighborhood (any point within
    * `radius` of a cell lies in a neighbor cell — candidate set is
    * provably complete), the join is a plain equi-join on the cell key,
    * and the exact integer `dx²+dy² ≤ r²` residual keeps precision 1.
    * The oracle states the truth as a direct all-pairs distance filter
    * — a DIFFERENT algorithm, so the hash match proves the bin join
    * loses no pair.
    *
    * Scale: work scales with pair density per cell (×9 replication of
    * one side), never |A|×|B|; a skew-hot cell is the same df-cap
    * problem as a hot shingle and the same remedies apply.
    *
    * Inputs: `(id, lat_m, lon_m)` with caller-distinct id column names.
    */
  def geoRadiusJoin(a: DataFrame, b: DataFrame, radius: Long): DataFrame = {
    require(radius > 0, s"geoRadiusJoin: radius=$radius must be positive")
    val r2 = radius * radius
    val aCells = a
      .withColumn("__cx", expr(s"lat_m div $radius"))
      .withColumn("__cy", expr(s"lon_m div $radius"))
    val bCells = b
      .withColumnRenamed("lat_m", "b_lat_m").withColumnRenamed("lon_m", "b_lon_m")
      .withColumn("__cx", explode(expr(
        s"sequence(b_lat_m div $radius - 1, b_lat_m div $radius + 1)")))
      .withColumn("__cy", explode(expr(
        s"sequence(b_lon_m div $radius - 1, b_lon_m div $radius + 1)")))
    aCells.join(bCells, Seq("__cx", "__cy"))
      .filter(expr(s"(lat_m - b_lat_m) * (lat_m - b_lat_m) + " +
        s"(lon_m - b_lon_m) * (lon_m - b_lon_m) <= $r2"))
      .drop("__cx", "__cy")
  }
}
