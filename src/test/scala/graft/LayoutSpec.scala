package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton key interleaves bits (known values) and round-trips") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y")).as("z"))
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) === 0L)
    assert(rows((1L, 0L)) === 1L)  // x → even bits
    assert(rows((0L, 1L)) === 2L)  // y → odd bits
    assert(rows((1L, 1L)) === 3L)
    // 3=0b11, 5=0b101 → interleave: y2x2 y1x1 y0x0 = 1,0 0,1 1,1 = 0b100111 = 39
    assert(rows((3L, 5L)) === 39L)
    assert(rows((65535L, 65535L)) === 0xFFFFFFFFL)
    // deinterleave on the driver: every (x,y) must round-trip
    def compact(z: Long): Long = {
      var c = z & 0x5555555555555555L
      c = (c | (c >> 1)) & 0x3333333333333333L
      c = (c | (c >> 2)) & 0x0F0F0F0F0F0F0F0FL
      c = (c | (c >> 4)) & 0x00FF00FF00FF00FFL
      (c | (c >> 8)) & 0x0000FFFF0000FFFFL
    }
    rows.foreach { case ((x, y), z) =>
      assert(compact(z) === x && compact(z >> 1) === y, s"roundtrip ($x,$y)")
    }
  }

  test("z-order buckets bound BOTH dimensions; 1-D sort does not") {
    // uniform grid: 64×64 points, 16 quadrant buckets (quadBits=2)
    val pts = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val ext = Layout.zorderExtents(pts, col("x"), col("y"), bits = 6, quadBits = 2)
      .collect()
    assert(ext.length === 16, "4^quadBits aligned quadrants")
    ext.foreach { r =>
      val (w, h) = (r.getAs[Long]("max_x") - r.getAs[Long]("min_x"),
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y"))
      // each Morton quadrant at quadBits=2 spans 1/4 of each axis: 16 cells
      assert(w <= 15 && h <= 15, s"bucket ${r.get(0)} extent ${w}x$h")
    }
    // contrast: bucketing by x alone leaves the y-extent at full range
    val sorted1d = pts.groupBy((col("x") / 16).cast("long").as("bucket"))
      .agg(max(col("y")) - min(col("y"))).collect()
    assert(sorted1d.forall(_.getLong(1) === 63L), "1-D layout: unbounded second dim")
  }

  test("mortonKey ≡ Compaction.zOrderValue 2-col form (the general interleave)") {
    val pts = spark.range(4096).select(
      (col("id") * 37 % 1024).as("x"), (col("id") * 101 % 1024).as("y"))
    val diff = pts.select(
        Layout.mortonKey(col("x"), col("y"), bits = 10).as("a"),
        graft.ops.Compaction.zOrderValue(Seq(col("x"), col("y")), bits = 10).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0L, "mask ladder must equal the unrolled interleave")
  }

  test("zOrderLayout partitions carry narrow bounding boxes") {
    val pts = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val clustered = graft.ops.Compaction.zOrderLayout(pts, Seq("x", "y"),
      bits = 6, numPartitions = 16)
    val boxes = clustered
      .select(spark_partition_id().as("pid"), col("x"), col("y"))
      .groupBy("pid")
      .agg((max(col("x")) - min(col("x"))).as("w"), (max(col("y")) - min(col("y"))).as("h"))
      .collect()
    assert(boxes.length > 1, "range partitioner actually split the data")
    // contiguous Z-ranges over a uniform grid: every partition's box is
    // far narrower than the 63×63 full extent in at least one dim, and
    // the AVERAGE area is a small fraction of the full square
    val areas = boxes.map(r => (r.getLong(1) + 1.0) * (r.getLong(2) + 1.0))
    assert(areas.sum / areas.length < 64.0 * 64.0 / 4,
      s"mean partition bbox area ${areas.sum / areas.length} not clustered")
  }

  test("zone-map pruned filter ≡ plain filter, and it actually prunes") {
    val ev = Tables.events(spark, sf001)
      .withColumn("value_cents", floor(col("value") * lit(100.0) + lit(0.5)))
    val bucket = shiftright(
      Layout.mortonKey(col("user_id"), shiftright(col("value_cents"), 8), 8), 10)
    val zm = Layout.zoneMap(ev, bucket, col("value_cents"))
    val zmRows = zm.collect()
    val (lo, hi) = (2000L, 3000L)
    val kept = zmRows.count(r => !(r.getAs[Long]("zm_max") < lo || r.getAs[Long]("zm_min") > hi))
    assert(kept < zmRows.length, "zone map keeps a strict subset of buckets")
    val pruned = Layout.zoneMapPrunedFilter(ev, bucket, col("value_cents"), zm, lit(lo), lit(hi))
      .select("event_id").as[Long].collect().sorted
    val plain = ev.filter(col("value_cents").between(lo, hi))
      .select("event_id").as[Long].collect().sorted
    assert(pruned.toSeq === plain.toSeq, "pruning is lossless")
  }

  test("zone maps are mergeable: zoneMap(a ∪ b) ≡ merge of the two zone maps") {
    // the append-path contract: on new data, merge the small new zone map
    // into the standing one (min/min, max/max, n+n) instead of rescanning
    val ev = Tables.events(spark, sf001)
      .withColumn("value_cents", floor(col("value") * lit(100.0) + lit(0.5)))
    val bucket = pmod(col("user_id"), lit(16L))
    val (a, b) = (ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1))
    val merged = Layout.zoneMap(a, bucket, col("value_cents"))
      .unionByName(Layout.zoneMap(b, bucket, col("value_cents")))
      .groupBy("zm_bucket")
      .agg(min("zm_min").as("zm_min"), max("zm_max").as("zm_max"), sum("zm_n").as("zm_n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val direct = Layout.zoneMap(ev, bucket, col("value_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged === direct)
  }

  test("writeOptimized: blooms + stats land in every row group footer; sorted ranges disjoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wopt").toString
    val df = spark.range(200000).select(
      col("id").as("k"), (col("id") % 97).as("v"))
    graft.ops.Compaction.writeOptimized(df, s"$dir/t", bloomCols = Seq("k"),
      sortCols = Seq("k"), rowGroupBytes = 1024 * 1024)
    val audit = graft.ops.Compaction.footerAudit(spark, s"$dir/t", Seq("k", "v"))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(audit("k") === ((true, true)), "bloom + stats on the keyed column")
    assert(audit("k")._2, "bloom filter present in every row group")
    assert(audit("v")._1 === false, "no bloom requested on v")
    assert(audit("v")._2 === true, "min/max stats always on")
    // read back: correctness unchanged, and the point predicate returns
    // through the bloom-enabled reader path
    val got = spark.read.parquet(s"$dir/t").filter(col("k") === 123456L)
      .select("v").collect()
    assert(got.length === 1 && got(0).getLong(0) === 123456L % 97)
    // vacuous-pass guards: a typo'd column FAILS the audit (no footer
    // matched), an empty directory throws — a layout CI gate can't
    // silently green on nothing
    val typo = graft.ops.Compaction.footerAudit(spark, s"$dir/t", Seq("nope"))
    assert(typo === Seq(("nope", false, false)))
    val empty = java.nio.file.Files.createTempDirectory("graft-empty").toString
    assertThrows[IllegalArgumentException](
      graft.ops.Compaction.footerAudit(spark, empty, Seq("k")))
  }
}
