package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the event-analytics ops: greedy funnel
  * chaining, window cutoffs, stalls, and the retention triangle. */
class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_type")
  }

  test("funnel: greedy chain, stalls leave nulls, entry window cuts late steps") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 24L, "purchase"), // complete inside entry+15
      (2L, 10L, "view"), (2L, 5L, "purchase"),                      // purchase precedes → stalls at 1
      (3L, 5L, "click"), (3L, 10L, "view"), (3L, 12L, "click"),     // pre-view click ignored
      (3L, 11L, "purchase"),                                        // 11 < ts_2=12 → stalls at 2
      (4L, 10L, "view"), (4L, 30L, "click"),                        // outside window 15
      (5L, 10L, "click"), (5L, 20L, "purchase"))                    // never entered → absent
    val got = EventAnalytics.funnel(events,
        Seq("view", "click", "purchase"), windowNs = 15L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((Some(10L), Some(20L), Some(24L), 3L)))
    assert(got(2L) === ((Some(10L), None, None, 1L)))
    assert(got(3L) === ((Some(10L), Some(12L), None, 2L)))
    assert(got(4L) === ((Some(10L), None, None, 1L)),
      "a step past entry+window must not match")
  }

  test("funnel: greedy earliest entry maximizes the window; guards reject bad params") {
    // two views: entry anchors at the EARLIEST (ts 5), so the window
    // [5, 25] still admits the click at 24
    val events = ev(
      (1L, 5L, "view"), (1L, 18L, "view"), (1L, 24L, "click"))
    val r = EventAnalytics.funnel(events, Seq("view", "click"), windowNs = 20L).head
    assert(r.getLong(1) === 5L && r.getLong(2) === 24L && r.getLong(3) === 2L)
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, Seq("view"), windowNs = 20L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, Seq("view", "view"), windowNs = 20L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, Seq("view", "click"), windowNs = 0L)
    }
  }

  test("cohort retention counts distinct users per (first-seen period, offset) cell") {
    val events = ev(
      (1L, 5L, "e"), (1L, 15L, "e"), (1L, 35L, "e"),   // cohort 0, offsets 0,1,3
      (2L, 12L, "e"), (2L, 13L, "e"), (2L, 25L, "e"),  // cohort 1, offsets 0,0,1
      (3L, 8L, "e"))                                    // cohort 0, offset 0
    val got = EventAnalytics.cohortRetention(events, periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 2L,   // users 1 and 3 active in their first period
      (0L, 1L) -> 1L,   // user 1 returns next period
      (0L, 3L) -> 1L,   // user 1 returns in period 3
      (1L, 0L) -> 1L,   // user 2's double event counts once
      (1L, 1L) -> 1L))
  }

  test("gapfillLocf: planted gaps fill at n=0 with the value carried forward") {
    import spark.implicits._
    // type A observed on days 0 and 3 (gap 1-2); type B only on day 2:
    // B's days 0-1 precede its first observation → null value, n=0
    val wal = Seq(
      (1L, "A", 10.0, 100L, 0),
      (2L, "A", 11.0, 200L, 0),  // later lsn same day wins day_last
      (3L, "A", 30.0, 300L, 3),
      (4L, "B", 99.0, 400L, 2)
    ).toDF("lsn", "event_type", "value", "ts_ms", "chunk_day")
      // constant ts_ms ties are fine: the combined key falls back to lsn
      .withColumn("ts_ms", lit(0L))
    val out = EventAnalytics.gapfillLocf(wal).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out.size === 8, "2 types × days 0..3")
    assert(out(("A", 0)) === ((2L, 11.0)), "last-by-lsn within the day")
    assert(out(("A", 1)) === ((0L, 11.0)), "gap day: n=0, value carried")
    assert(out(("A", 2)) === ((0L, 11.0)))
    assert(out(("A", 3)) === ((1L, 30.0)))
    assert(out(("B", 0)) === ((0L, null)), "before first observation: null")
    assert(out(("B", 1)) === ((0L, null)))
    assert(out(("B", 2)) === ((1L, 99.0)))
    assert(out(("B", 3)) === ((0L, 99.0)))
    val fl = EventAnalytics.timeBucketFirstLast(wal)
      .filter(col("event_type") === "A" && col("chunk_day") === 0).head()
    assert(fl.getAs[Double]("first_value") === 10.0)
    assert(fl.getAs[Double]("last_value") === 11.0)
  }

  test("timeWeighted: LOCF integral over the observed span, exact integers") {
    import spark.implicits._
    val wal = Seq(
      (1L, "A", 1.0, 0L, 0), (2L, "A", 3.0, 10L, 0), (3L, "A", 5.0, 30L, 0),
      (4L, "B", 7.0, 5L, 0) // singleton: zero integral, zero span
    ).toDF("lsn", "event_type", "value", "ts_ms", "chunk_day")
    val out = EventAnalytics.timeWeighted(wal).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") === ((1000L * 10 + 3000L * 20, 30L, 3L)),
      "Σ vᵢ·(tᵢ₊₁−tᵢ): 1.0 holds 10ms, 3.0 holds 20ms, last extends nowhere")
    assert(out("B") === ((0L, 0L, 1L)))
  }

  test("cusumChangePoint: the planted mean shift peaks exactly at the boundary") {
    import spark.implicits._
    val wal = (1L to 20L).map(l =>
      (l, "A", if (l <= 10) 1.0 else 5.0)).toDF("lsn", "event_type", "value")
    val r = EventAnalytics.cusumChangePoint(wal).head()
    assert(r.getAs[Long]("change_lsn") === 10L, "peak at the shift boundary")
    // n·c₁₀ − 10·S = |20·10000 − 10·60000| = 400000 (milli units)
    assert(r.getAs[Long]("max_dev") === 400000L)
    assert(r.getAs[Long]("n") === 20L && r.getAs[Long]("sum_milli") === 60000L)
    // a constant series has zero deviation everywhere (ties → lsn 1)
    val flat = (1L to 9L).map(l => (l, "B", 2.0)).toDF("lsn", "event_type", "value")
    val f = EventAnalytics.cusumChangePoint(flat).head()
    assert(f.getAs[Long]("max_dev") === 0L && f.getAs[Long]("change_lsn") === 1L)
  }

  test("counterDelta: monotone increases sum, a drop restarts the counter") {
    import spark.implicits._
    val wal = Seq(
      (1L, 9L, 5.0, 0L), (2L, 9L, 7.0, 1L), (3L, 9L, 3.0, 2L), (4L, 9L, 4.0, 3L)
    ).toDF("lsn", "user_id", "value", "ts_ms")
    val r = EventAnalytics.counterDelta(wal).head()
    assert(r.getAs[Long]("delta_milli") === 2000L + 3000L + 1000L,
      "+2 increase, reset contributes 3 whole, +1 increase")
    assert(r.getAs[Long]("n_resets") === 1L)
    assert(r.getAs[Long]("n") === 4L)
  }

  test("gaugeAgg: signed delta, edge pairs, single-sample and zero-gap NULLs") {
    import spark.implicits._
    // A/day1: 5.0@0 → 8.0@1000 → 2.0@3000. delta = 2000−5000 = −3000
    // (signed — NO reset reinterpretation); left pair +3000/1000ms →
    // +3M micro, right pair −6000/2000ms → −3M micro.
    // B/day2: one sample — delta 0, no pair.
    // C/day1: two samples at the SAME ts (lsn breaks the tie): idelta
    // defined, rate NULL (zero gap), never a division error.
    val wal = Seq(
      (1L, "A", 1, 5.0, 0L), (2L, "A", 1, 8.0, 1000L), (3L, "A", 1, 2.0, 3000L),
      (9L, "B", 2, 7.0, 5000L),
      (4L, "C", 1, 1.0, 100L), (5L, "C", 1, 4.0, 100L)
    ).toDF("lsn", "event_type", "chunk_day", "value", "ts_ms")
    val got = ops.EventAnalytics.gaugeAgg(wal).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    val a = got(("A", 1))
    assert(a.getAs[Long]("n") === 3L)
    assert(a.getAs[Long]("delta_milli") === -3000L)
    assert(a.getAs[Long]("idelta_left_milli") === 3000L)
    assert(a.getAs[Long]("idelta_right_milli") === -6000L)
    assert(a.getAs[Long]("irate_left_micro") === 3000000L)
    assert(a.getAs[Long]("irate_right_micro") === -3000000L)
    val b = got(("B", 2))
    assert(b.getAs[Long]("delta_milli") === 0L)
    assert(b.isNullAt(b.fieldIndex("idelta_left_milli")) &&
      b.isNullAt(b.fieldIndex("irate_right_micro")))
    val c = got(("C", 1))
    assert(c.getAs[Long]("delta_milli") === 3000L)
    assert(c.getAs[Long]("idelta_left_milli") === 3000L &&
      c.getAs[Long]("idelta_right_milli") === 3000L)
    assert(c.isNullAt(c.fieldIndex("irate_left_micro")) &&
      c.isNullAt(c.fieldIndex("irate_right_micro")), "zero gap rates to NULL")
  }

  test("stateTimeline: run-length periods, [start, next-start) ends, last closes on itself") {
    import spark.implicits._
    // user 1: A@0 A@10 B@20 A@30 → periods A[0,20) (2 events),
    // B[20,30), A[30,30] (last closes at its own observation).
    // user 2: single event → one zero-length period.
    val wal = Seq(
      (1L, 1L, "A", 0L), (2L, 1L, "A", 10L), (3L, 1L, "B", 20L), (4L, 1L, "A", 30L),
      (9L, 2L, "C", 100L)
    ).toDF("lsn", "user_id", "event_type", "ts_ms")
    val got = ops.EventAnalytics.stateTimeline(wal)
      .orderBy("user_id", "period").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got === Seq(
      (1L, 1L, "A", 0L, 20L, 20L, 2L),
      (1L, 2L, "B", 20L, 30L, 10L, 1L),
      (1L, 3L, "A", 30L, 30L, 0L, 1L),
      (2L, 1L, "C", 100L, 100L, 0L, 1L)))
  }

  test("saturating i32 math clamps at the exact bounds, passes through inside them") {
    import spark.implicits._
    import ops.EventAnalytics._
    val df = Seq(
      (Int.MaxValue, 1), (Int.MinValue, 1), (65536, 65536), (-65536, 65536),
      (-5, 2), (3, 5), (100, 23)
    ).toDF("a", "b")
    val r = df.select(
      saturatingAdd(col("a"), col("b")).as("add"),
      saturatingSub(col("a"), col("b")).as("sub"),
      saturatingMul(col("a"), col("b")).as("mul"),
      saturatingAddPos(col("a"), col("b")).as("addp"),
      saturatingSubPos(col("a"), col("b")).as("subp")).collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4)))
    assert(r(0) === ((Int.MaxValue, Int.MaxValue - 1, Int.MaxValue, Int.MaxValue, Int.MaxValue - 1)))
    assert(r(1)._1 === Int.MinValue + 1 && r(1)._2 === Int.MinValue &&
      r(1)._3 === Int.MinValue && r(1)._4 === 0 && r(1)._5 === 0)
    assert(r(2)._3 === Int.MaxValue && r(3)._3 === Int.MinValue)
    assert(r(4) === ((-3, -7, -10, 0, 0)))
    assert(r(5) === ((8, -2, 15, 8, 0)))
    assert(r(6) === ((123, 77, 2300, 123, 77)))
  }

  test("candlestickRollup: weekly merge of daily candles equals from-scratch weekly") {
    import spark.implicits._
    // ticks span two weeks with open/close crossing day boundaries and
    // a volume-weighted price that only reconciles if VWAP re-derives
    // from merged sums (average-of-daily-VWAPs would be wrong)
    val wal = (1L to 40L).map { l =>
      (l, "A", ((l * 3L) % 14L).toInt, 10.0 + (l % 7L).toDouble,
        l * 1000L, s"""{"k": ${1 + (l % 5L)}}""")
    }.toDF("lsn", "event_type", "chunk_day", "value", "ts_ms", "props")
    val daily = ops.EventAnalytics.candlestick(wal)
    val merged = ops.EventAnalytics.candlestickRollup(daily)
      .orderBy("event_type", "chunk_week").collect().map(_.toString)
    val scratch = ops.EventAnalytics.candlestick(
        wal.withColumn("chunk_day", expr("chunk_day div 7")))
      .withColumnRenamed("chunk_day", "chunk_week")
      .withColumn("chunk_week", col("chunk_week").cast("long"))
      .orderBy("event_type", "chunk_week").collect().map(_.toString)
    assert(merged.toSeq === scratch.toSeq,
      "rollup contract: merging daily states must equal the from-scratch week")
  }

  test("interpolatedDurationIn: holds split exactly at day boundaries, open last excluded") {
    import spark.implicits._
    val day = 86400000L
    val wal = Seq(
      // user 1: A held 1s before + 1s after midnight, then B for 1s
      (1L, 1L, "A", day - 1000L), (2L, 1L, "B", day + 1000L), (3L, 1L, "B", day + 2000L),
      // user 2: one C hold spanning three whole days (fan-out bounded
      // by span, not events), then the open last event drops
      (9L, 2L, "C", 0L), (10L, 2L, "C", 3L * day)
    ).toDF("lsn", "user_id", "event_type", "ts_ms")
    val base = -19723 // chunk_day of epoch day 0
    val got = ops.EventAnalytics.interpolatedDurationIn(wal)
      .orderBy("state", "chunk_day").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got === Seq(
      ("A", base, 1000L, 1L), ("A", base + 1, 1000L, 1L),
      ("B", base + 1, 1000L, 1L),
      ("C", base, day, 1L), ("C", base + 1, day, 1L), ("C", base + 2, day, 1L)))
  }

  test("round-13 ops are partitioning-invariant (window orders carry the lsn tiebreak)") {
    import spark.implicits._
    val wal = (1L to 60L).map { l =>
      (l, l % 7L, Seq("A", "B", "C")((l % 3L).toInt), (l * 37L) % 50000L,
        ((l * 13L) % 9L).toDouble, ((l % 5L) - 19723L + 19723L).toInt)
    }.toDF("lsn", "user_id", "event_type", "ts_ms", "value", "chunk_day")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(ops.EventAnalytics.gaugeAgg(wal))
      === rows(ops.EventAnalytics.gaugeAgg(wal.repartition(7))))
    assert(rows(ops.EventAnalytics.stateTimeline(wal))
      === rows(ops.EventAnalytics.stateTimeline(wal.repartition(7))))
    assert(rows(ops.EventAnalytics.interpolatedDurationIn(wal))
      === rows(ops.EventAnalytics.interpolatedDurationIn(wal.repartition(7))))
    assert(rows(graft.cdc.Cdc.lsnGaps(wal.select("lsn").filter(col("lsn") % 4 =!= 0), 3))
      === rows(graft.cdc.Cdc.lsnGaps(
        wal.select("lsn").filter(col("lsn") % 4 =!= 0).repartition(7), 3)))
  }

  test("gapfillInterpolate: linear mid-gap, passthrough observed, NULL edges") {
    import spark.implicits._
    // type A observed on days 1 and 4 (10.0 → 40.0): days 2,3 interpolate
    // to 20000/30000 milli; type B observed only on day 2 → its days
    // 1/3/4 have one-sided anchors → NULL
    val wal = Seq(
      (1L, "A", 1, 10.0, 1000L), (2L, "A", 4, 40.0, 4000L),
      (3L, "B", 2, 7.0, 2000L)
    ).toDF("lsn", "event_type", "chunk_day", "value", "ts_ms")
    val r = ops.EventAnalytics.gapfillInterpolate(wal)
      .orderBy(col("event_type"), col("chunk_day")).collect()
    assert(r.length === 8, "2 types x days 1..4")
    val a = r.filter(_.getString(0) == "A").map(x =>
      x.getInt(1) -> (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(a(1) === Some(10000L) && a(4) === Some(40000L), "observed passthrough")
    assert(a(2) === Some(20000L) && a(3) === Some(30000L), "linear fill")
    val b = r.filter(_.getString(0) == "B").map(x =>
      x.getInt(1) -> (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(b(2) === Some(7000L))
    assert(b(1).isEmpty && b(3).isEmpty && b(4).isEmpty,
      "no slope past the observed range")
  }

  test("instantRate: final pair drives both conventions; reset splits them") {
    import spark.implicits._
    // series A final pair: 8.0 @t=1000 → 2.0 @t=3000 (a reset).
    // Gauge: idelta −6000 milli over 2000 ms; −6000/2000 × 10⁶ =
    // −3_000_000 micro/s. Counter: the drop restarts, so idelta is the
    // new level 2000 milli → +1_000_000 micro/s.
    val wal = Seq(
      (1L, "A", 5.0, 0L), (2L, "A", 8.0, 1000L), (3L, "A", 2.0, 3000L),
      (9L, "ONE", 1.0, 0L) // single sample: no pair, drops out
    ).toDF("lsn", "event_type", "value", "ts_ms")
    val rows = ops.EventAnalytics.instantRate(wal).collect()
    assert(rows.length === 1, "single-sample series dropped")
    val r = rows.head
    assert(r.getAs[Long]("idelta_milli") === -6000L)
    assert(r.getAs[Long]("dt_ms") === 2000L)
    assert(r.getAs[Long]("counter_idelta_milli") === 2000L)
    assert(r.getAs[Long]("irate_micro") === -3000000L)
    assert(r.getAs[Long]("counter_irate_micro") === 1000000L)
  }

  test("counterIncreaseExtrapolated: hand-computed Prometheus extrapolation") {
    import spark.implicits._
    // chunk_day 0 → range [19723·86400000, +1d). Samples at 1/4, 1/2,
    // 3/4 of the day, counter 0→10→20 (delta 20000 milli, no resets).
    // sampled = 12h, avg spacing = 6h; both edge gaps are 6h ≥ 1.1·avg?
    // 6h < 6.6h → extrapolate fully to the edges, EXCEPT the start side
    // is capped by the zero crossing: v_first=0 → to_zero=0, so only the
    // end gap extends. extrap = 12h + 0 + 6h = 18h → factor 1.5.
    val day0 = 19723L * 86400000L
    val wal = Seq(
      (1L, "A", 0, 0.0,  day0 + 21600000L),
      (2L, "A", 0, 10.0, day0 + 43200000L),
      (3L, "A", 0, 20.0, day0 + 64800000L)
    ).toDF("lsn", "event_type", "chunk_day", "value", "ts_ms")
    val r = ops.EventAnalytics.counterIncreaseExtrapolated(wal).head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_resets") === 0L)
    assert(r.getAs[Long]("delta_milli") === 20000L)
    assert(r.getAs[Long]("increase_micro") === 30000000L,
      "20000 milli · 1.5 extrapolation = 30000 milli = 3·10⁷ micro")
    // single-sample bucket: no rate is defined
    val one = Seq((1L, "A", 0, 5.0, day0 + 100L))
      .toDF("lsn", "event_type", "chunk_day", "value", "ts_ms")
    assert(ops.EventAnalytics.counterIncreaseExtrapolated(one)
      .head().isNullAt(5))
  }

  test("statsAgg: hand-computed accumulator and slope on a perfect line") {
    import spark.implicits._
    // perfect line y_milli = 2000·x over minutes 0,1,2:
    // slope = 2000 milli-units/minute → slope_micro = 2000·10⁶, intercept 0
    val wal = Seq(
      (1L, "A", 0.0, 0L), (2L, "A", 2.0, 60000L), (3L, "A", 4.0, 120000L)
    ).toDF("lsn", "event_type", "value", "ts_ms")
    val r = EventAnalytics.statsAgg(wal).head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("sum_x") === 3L)      // minutes 0+1+2
    assert(r.getAs[Long]("sum_y") === 6000L)   // 0+2000+4000 milli
    assert(r.getAs[Long]("sum_xy") === 10000L) // 0 + 2000 + 8000
    assert(r.getAs[Long]("sum_x2") === 5L)
    assert(r.getAs[Long]("slope_micro") === 2000L * 1000000L)
    assert(r.getAs[Long]("intercept_milli") === 0L)
  }

  test("statsAgg rollup contract: fine-grained accumulators merge by addition") {
    import spark.implicits._
    val wal = (1L to 40L).map(i =>
      (i, "A", (i % 7).toDouble, i * 60000L, (i % 3).toInt))
      .toDF("lsn", "event_type", "value", "ts_ms", "chunk_day")
    // fine accumulators per (type, day), then summed per type, must equal
    // the direct per-type accumulator — BOTH share one x origin (the
    // corpus min), which is what makes the sums mergeable
    val fine = EventAnalytics.statsAgg(wal, Seq("event_type", "chunk_day"))
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sum_x").as("sum_x"), sum("sum_y").as("sum_y"),
        sum("sum_xy").as("sum_xy"), sum("sum_x2").as("sum_x2"),
        sum("sum_y2").as("sum_y2"))
      .head()
    val direct = EventAnalytics.statsAgg(wal).head()
    Seq("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2").foreach { c =>
      assert(fine.getAs[Long](c) === direct.getAs[Long](c), c)
    }
  }

  test("stats2dAccessors: perfect line pins corr/r2/x-intercept, constant side nulls corr") {
    import spark.implicits._
    // perfect line y = 2x + 2000 milli over minutes 0,1,2: corr = 1,
    // r² = 1, x_intercept = −b/m = −1 minute = −1000 milli-minutes
    val wal = Seq(
      (1L, "A", 2.0, 0L), (2L, "A", 4.0, 60000L), (3L, "A", 6.0, 120000L),
      // constant-y series: zero variance on the y side → corr is NULL
      (4L, "B", 5.0, 0L), (5L, "B", 5.0, 60000L)
    ).toDF("lsn", "event_type", "value", "ts_ms")
    val rows = EventAnalytics.stats2dAccessors(wal).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("A")
    assert(a.getAs[Long]("corr_micro") === 1000000L)
    assert(a.getAs[Long]("determination_micro") === 1000000L)
    assert(a.getAs[Long]("slope_micro") === 2000L * 1000000L)
    assert(a.getAs[Long]("intercept_milli") === 2000L)
    assert(a.getAs[Long]("x_intercept_milli") === -1000L)
    // population covariance of x={0,1,2}, y={2000,4000,6000}:
    // E[xy] − E[x]E[y] = (0+4000+12000)/3 − 1·4000 = 1333.33 → floor+0.5
    assert(a.getAs[Long]("covar_xy") === 1333L)
    val b = rows("B")
    assert(b.isNullAt(b.fieldIndex("corr_micro")), "constant y must null corr")
    assert(b.isNullAt(b.fieldIndex("determination_micro")))
  }

  test("statsMoments: symmetric two-point kurtosis is exactly -2, planted skew signs") {
    import spark.implicits._
    // two-point symmetric {0, 20.0} → deci y {0, 200}: m2 = 10⁴,
    // m4 = 10⁸ → kurt = 1 → excess = −2 exactly (every double step is a
    // power of ten times a small integer — no rounding anywhere)
    val wal = Seq(
      (1L, "S", 0.0, 0), (2L, "S", 20.0, 0),
      // {0, 0, 30.0} → deci {0,0,300}: right tail, hand-derived
      // skew = 2·10⁶/(2·10⁴·√(2·10⁴)) = 1/√2 → 707107 micro
      (3L, "R", 0.0, 0), (4L, "R", 0.0, 0), (5L, "R", 30.0, 0),
      // constant series: zero variance → both accessors NULL
      (6L, "C", 7.0, 0), (7L, "C", 7.0, 0)
    ).toDF("lsn", "event_type", "value", "chunk_day")
    val rows = EventAnalytics.statsMoments(wal).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = rows("S")
    assert(s.getAs[Long]("skew_micro") === 0L)
    assert(s.getAs[Long]("kurtosis_micro") === -2000000L)
    assert(s.getAs[Long]("sum_y4") === 1600000000L)
    val r = rows("R")
    assert(r.getAs[Long]("skew_micro") === 707107L)
    val c = rows("C")
    assert(c.isNullAt(c.fieldIndex("skew_micro")))
    assert(c.isNullAt(c.fieldIndex("kurtosis_micro")))
  }

  test("maxN: planted extremes with lsn ties, and the plan keeps a WindowGroupLimit") {
    import spark.implicits._
    val wal = Seq(
      (1L, "A", 9.0, 10L), (2L, "A", 9.0, 11L), (3L, "A", 1.0, 12L),
      (4L, "A", 5.0, 13L), (5L, "A", 7.0, 14L)
    ).toDF("lsn", "event_type", "value", "user_id")
    val got = EventAnalytics.maxN(wal, n = 2).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (r.getAs[Long]("v_milli"), r.getAs[Long]("lsn"), r.getAs[Long]("user_id")))
      .toMap
    // value tie at 9000 milli: lsn ascending breaks it deterministically
    assert(got(("max_n", 1L)) === ((9000L, 1L, 10L)))
    assert(got(("max_n", 2L)) === ((9000L, 2L, 11L)))
    assert(got(("min_n", 1L)) === ((1000L, 3L, 12L)))
    assert(got(("min_n", 2L)) === ((5000L, 4L, 13L)))
    // the rnk ≤ n filter must compile to a per-partition group limit —
    // the bounded-state contract that makes this the toolkit's max_n
    // at scale (the exchange moves top-k rows, never the corpus)
    val plan = EventAnalytics.maxN(wal, n = 2).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("hdrPercentileRank: whole buckets below, integer interpolation inside, saturates at 1e6") {
    import spark.implicits._
    // cents 3,7,15,31 land in buckets 2,3,4,5 (shifted 4,8,16,32)
    val wal = Seq(
      (1L, "A", 0.03), (2L, "A", 0.07), (3L, "A", 0.15), (4L, "A", 0.31)
    ).toDF("lsn", "event_type", "value")
    val got = EventAnalytics.hdrPercentileRank(wal, Seq(2L, 7L, 31L, 1000L))
      .collect().map(r => r.getLong(1) -> r.getAs[Long]("rank_ppm")).toMap
    // probe 2 (shifted 3, bucket 1): nothing below, bucket absent → 0
    assert(got(2L) === 0L)
    // probe 7 (shifted 8, pb 3, pw 8): 1 whole bucket below + (8−8+1)·1 div 8 = 1 → 1/4
    assert(got(7L) === 250000L)
    // probe 31 (shifted 32, pb 5, pw 32): 3 below + 1·1 div 32 = 3 → 3/4
    assert(got(31L) === 750000L)
    // probe beyond the max: every bucket below → saturates at 1e6
    assert(got(1000L) === 1000000L)
    intercept[IllegalArgumentException] {
      EventAnalytics.hdrPercentileRank(wal, Seq(-5L))
    }
  }

  test("stateAgg: LOCF dwell per state, open intervals counted apart") {
    import spark.implicits._
    // user 9: A(t=0) → B(t=100) → A(t=300) → open; user 8: B(t=0) → open
    val wal = Seq(
      (1L, 9L, "A", 0L), (2L, 9L, "B", 100L), (3L, 9L, "A", 300L),
      (4L, 8L, "B", 0L)
    ).toDF("lsn", "user_id", "event_type", "ts_ms")
    val rows = EventAnalytics.stateAgg(wal).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("total_ms"),
        r.getAs[Long]("n_intervals"), r.getAs[Long]("n_transitions_out"),
        r.getAs[Long]("n_open"))).toMap
    assert(rows("A") === ((100L, 1L, 1L, 1L)))
    assert(rows("B") === ((200L, 1L, 1L, 1L)))
  }

  test("lttb: ≤ nBuckets picks per series, picks are real points, spike survives") {
    import spark.implicits._
    // a flat series with one towering spike: any sane downsample keeps it
    val wal = (0L until 200L).map { i =>
      (i + 1, "A", if (i == 137) 500.0 else 1.0 + (i % 3) * 0.01, i * 60000L)
    }.toDF("lsn", "event_type", "value", "ts_ms")
    val picks = EventAnalytics.lttbDownsample(wal, nBuckets = 10).collect()
    assert(picks.length === 10)
    assert(picks.map(_.getAs[Long]("bucket")).distinct.length === 10)
    assert(picks.exists(_.getAs[Long]("v_centi") === 50000L), "spike kept")
    // every pick is an actual input point
    val inputs = (0L until 200L).map(i => (i * 60000L,
      math.floor((if (i == 137) 500.0 else 1.0 + (i % 3) * 0.01) * 100 + 0.5).toLong)).toSet
    picks.foreach(p => assert(inputs.contains(
      (p.getAs[Long]("ts_ms"), p.getAs[Long]("v_centi")))))
    // partitioning-invariant (exact integer argmax, deterministic ties)
    val again = EventAnalytics.lttbDownsample(
      wal.repartition(13), nBuckets = 10).collect()
    assert(picks.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ===
      again.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq)
  }

  test("interpolated time-weight: holds split exactly at day boundaries and conserve mass") {
    import spark.implicits._
    val day = 86400000L
    // type A: value 2.0 held from day0 18:00 across midnight to day1
    // 06:00, then 4.0 held until day1 12:00 (open tail excluded)
    val wal = Seq(
      (1L, "A", day * 3 / 4, 2.0),      // 18:00 day0
      (2L, "A", day + day / 4, 4.0),    // 06:00 day1
      (3L, "A", day + day / 2, 9.0))    // 12:00 day1 (last: no hold)
      .toDF("lsn", "event_type", "ts_ms", "value")
    val got = EventAnalytics.timeWeightedInterpolated(wal).collect()
      .map(r => r.getAs[Int]("chunk_day") ->
        (r.getAs[Long]("weighted_milli_ms"), r.getAs[Long]("covered_ms"))).toMap
    val d0 = -19723 // fixture ts starts at epoch, not 2024
    // day0 gets 6h of 2.0; day1 gets 6h of 2.0 + 6h of 4.0
    assert(got(d0) === ((2000L * (day / 4), day / 4)))
    assert(got(d0 + 1) === ((2000L * (day / 4) + 4000L * (day / 4), day / 2)))
    // conservation: per-day numerators sum to the unsplit span integral
    val whole = 2000L * (day / 2) + 4000L * (day / 4)
    assert(got.values.map(_._1).sum === whole)
    assert(got.values.map(_._2).sum === day * 3 / 4)
  }

  test("hdrQuantiles: estimates within the 2x bucket bound, exact on planted powers, partition-invariant") {
    import spark.implicits._
    // geometric spread so several log2 buckets fill
    val vals = (1 to 1000).map(i => (i.toLong, "A", i * 0.01)) // cents 1..1000
    val wal = vals.toDF("lsn", "event_type", "value")
    val got = EventAnalytics.hdrQuantiles(wal)
      .collect().map(r => r.getAs[Int]("p") -> r.getAs[Long]("approx_cents")).toMap
    // exact pth percentile of cents 1..1000 is 10·p; HDR guarantees the
    // estimate stays within the containing power-of-two bucket
    for (p <- Seq(50, 90, 99)) {
      val exact = 10L * p
      val lo = java.lang.Long.highestOneBit(exact + 1) - 1
      val hi = 2 * (lo + 1) - 1
      assert(got(p) >= lo && got(p) <= hi,
        s"p$p estimate ${got(p)} escaped its bucket [$lo,$hi]")
    }
    // the sketch is a plain keyed count: estimates cannot depend on layout
    val again = EventAnalytics.hdrQuantiles(wal.repartition(11))
      .collect().map(r => r.getAs[Int]("p") -> r.getAs[Long]("approx_cents")).toMap
    assert(again === got)
    intercept[IllegalArgumentException] {
      EventAnalytics.hdrQuantiles(wal, percentiles = Seq(0))
    }
  }

  test("candlestick: OHLC by order key, integer VWAP, day bars re-aggregate to the range bar") {
    import spark.implicits._
    // ticks across two days; prices chosen so open≠low and close≠high
    val wal = Seq(
      // (lsn, event_type, chunk_day, ts_ms, value, props)
      (1L, "A", 0, 1000L, 5.00, """{"k": 2}"""),  // day0 open
      (2L, "A", 0, 2000L, 9.00, """{"k": 1}"""),  // day0 high
      (3L, "A", 0, 3000L, 3.00, """{"k": 0}"""),  // day0 low (zero volume tick)
      (4L, "A", 0, 4000L, 7.00, """{"k": 3}"""),  // day0 close
      (5L, "A", 1, 5000L, 6.00, """{"k": 4}"""))
      .toDF("lsn", "event_type", "chunk_day", "ts_ms", "value", "props")
    val bars = EventAnalytics.candlestick(wal).collect()
      .map(r => r.getAs[Int]("chunk_day") -> r).toMap
    val d0 = bars(0)
    assert(d0.getAs[Long]("open_cents") === 500L)
    assert(d0.getAs[Long]("high_cents") === 900L)
    assert(d0.getAs[Long]("low_cents") === 300L)
    assert(d0.getAs[Long]("close_cents") === 700L)
    assert(d0.getAs[Long]("volume") === 6L)
    // notional = 500·2 + 900·1 + 300·0 + 700·3 = 4000 → vwap 666666 µ$
    assert(d0.getAs[Long]("notional_cents") === 4000L)
    assert(d0.getAs[Long]("vwap_micro") === 4000L * 10000 / 6)
    // rollup contract: merging day accumulators with min/max/sum plus
    // order-key-anchored open/close equals the bar computed on raw ticks
    val merged = EventAnalytics.candlestick(wal.withColumn("chunk_day", lit(0)))
      .collect().head
    assert(merged.getAs[Long]("open_cents") === 500L)
    assert(merged.getAs[Long]("close_cents") === 600L)
    assert(merged.getAs[Long]("volume") === 10L)
    assert(merged.getAs[Long]("notional_cents") === 4000L + 600L * 4)
  }

  test("candlestick: all-zero volume day yields null VWAP, never a division error") {
    import spark.implicits._
    val wal = Seq((1L, "A", 0, 1000L, 5.0, """{"k": 0}"""))
      .toDF("lsn", "event_type", "chunk_day", "ts_ms", "value", "props")
    val bar = EventAnalytics.candlestick(wal).collect().head
    assert(bar.getAs[Long]("volume") === 0L)
    assert(bar.isNullAt(bar.fieldIndex("vwap_micro")))
  }

  test("heartbeat: TTL merge, gap accounting, and the single-beat edge") {
    import spark.implicits._
    // ttl=10: user 1 beats at 0,5,30 → ranges [0,15)+[30,40): uptime
    // 5+10+10=25, one 25-gap (>ttl), 2 live ranges, downtime 30+10-25=15.
    // user 2 beats once → uptime = ttl, 1 range, no gaps, 0 downtime.
    val wal = Seq(
      (1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 30L),
      (4L, 2L, 100L))
      .toDF("lsn", "user_id", "ts_ms")
    val got = EventAnalytics.heartbeatAgg(wal, ttlMs = 10L)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = got(1L)
    assert(u1.getAs[Long]("n_beats") === 3L)
    assert(u1.getAs[Long]("uptime_ms") === 25L)
    assert(u1.getAs[Long]("num_live_ranges") === 2L)
    assert(u1.getAs[Long]("longest_gap_ms") === 25L)
    assert(u1.getAs[Long]("downtime_ms") === 15L)
    val u2 = got(2L)
    assert(u2.getAs[Long]("uptime_ms") === 10L)
    assert(u2.getAs[Long]("num_live_ranges") === 1L)
    assert(u2.isNullAt(u2.fieldIndex("longest_gap_ms")))
    assert(u2.getAs[Long]("downtime_ms") === 0L)
    // uptime never exceeds observed span + ttl; both invariant under repartition
    val again = EventAnalytics.heartbeatAgg(wal.repartition(7), ttlMs = 10L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("uptime_ms")).toMap
    assert(again === got.view.mapValues(_.getAs[Long]("uptime_ms")).toMap)
  }

  test("freq_agg: exact when distinct <= capacity — counts, zero dec, partition-invariant") {
    import spark.implicits._
    import graft.functions.MisraGriesAgg.freq_agg
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    def run(parts: Int) = {
      val df = rows.toDF("k").repartition(parts)
      df.agg(freq_agg(col("k"), 8).as("fa"))
        .select(col("fa.items").as("items"), col("fa.dec").as("dec"),
          col("fa.n").as("n"))
        .head
    }
    val r = run(1)
    assert(r.getAs[Long]("dec") === 0L, "no decrement round may fire in the exact regime")
    assert(r.getAs[Long]("n") === 100L)
    val items = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(items === Seq(("a", 50L), ("b", 30L), ("c", 20L)),
      "exact-regime estimates are the true counts, sorted (est desc, key)")
    // byte-identical under any partitioning: merge order must not matter
    assert(run(7) === r)
    assert(run(32) === r)
  }

  test("freq_agg: inexact regime keeps the MG contract — est <= true <= est+dec, dec <= n/(k+1)") {
    import spark.implicits._
    import graft.functions.MisraGriesAgg.freq_agg
    // one heavy key among 100 light ones, capacity 4: the table is
    // forced to decrement constantly, but the heavy key must survive
    // because true(heavy) > n/(k+1) >= dec
    val truth = ("heavy" -> 500L) +: (0 until 100).map(i => s"f$i" -> 2L)
    val rows = truth.flatMap { case (k, c) => Seq.fill(c.toInt)(k) }
    val trueCounts = truth.toMap
    val n = rows.size.toLong
    for (parts <- Seq(1, 13)) {
      val r = scala.util.Random.shuffle(rows).toDF("k").repartition(parts)
        .agg(freq_agg(col("k"), 4).as("fa"))
        .select(col("fa.items").as("items"), col("fa.dec").as("dec")).head
      val dec = r.getAs[Long]("dec")
      assert(dec <= n / 5, s"MG bound violated: dec=$dec > n/(k+1)=${n / 5}")
      val items = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getString(0), x.getLong(1)))
      assert(items.size <= 4)
      items.foreach { case (k, est) =>
        val t = trueCounts(k)
        assert(est <= t && t <= est + dec,
          s"interval violated for $k: est=$est true=$t dec=$dec")
      }
      assert(items.exists(_._1 === "heavy"),
        "a key with true count > dec is guaranteed present")
    }
  }

  test("asap: periodic series picks the seasonal window (smallest on ties), ramp picks the narrowest") {
    import spark.implicits._
    // period-6 hourly pattern over 72h: every multiple-of-6 window has
    // constant moving sums (roughness 0) — tie resolves to w=6; the
    // smoothed series is the constant one-period sum
    val periodic = (0 until 72).map(h =>
      (h.toLong, "per", h.toLong * 3600000L, if (h % 6 == 5) 6.0 else 1.0))
    // linear ramp: dd = c·w is constant per window, so roughness grows
    // with w² — the narrowest candidate wins
    val ramp = (0 until 72).map(h =>
      (100L + h, "ramp", h.toLong * 3600000L, h.toDouble))
    val wal = (periodic ++ ramp).toDF("lsn", "event_type", "ts_ms", "value")
    val got = EventAnalytics.asapSmooth(wal)
    val winners = got.select(col("event_type"), col("window_w")).distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(winners === Map("per" -> 6, "ramp" -> 2))
    val perRows = got.filter(col("event_type") === "per")
      .orderBy(col("hour")).collect()
    assert(perRows.length === 72 - 5, "one full-frame row per hour >= minh+w-1")
    assert(perRows.forall(_.getAs[Long]("smoothed_milli") === 11000L),
      "period-aligned smoothing flattens the series to the period sum")
    // partition invariance of the whole output
    val again = EventAnalytics.asapSmooth(wal.repartition(17))
      .orderBy(col("event_type"), col("hour")).collect().toSeq
    assert(again === got.orderBy(col("event_type"), col("hour")).collect().toSeq)
  }

  test("asap: a missing hour densifies to zero, frames stay physical hours") {
    import spark.implicits._
    // hours 0..10 with hour 5 absent: the densified axis still spans
    // 11 hours, so every candidate window w emits span-w+1 full frames
    val wal = (0 to 10).filter(_ != 5).map(h =>
      (h.toLong, "g", h.toLong * 3600000L, 1.0)).toDF("lsn", "event_type", "ts_ms", "value")
    val got = EventAnalytics.asapSmooth(wal, candidates = Seq(2, 3))
    val w = got.select(col("window_w")).head.getInt(0)
    assert(got.count() === 11 - w + 1)
    // the frames crossing the gap sum one fewer contributing point
    val byHour = got.collect().map(r =>
      r.getAs[Long]("hour") -> r.getAs[Long]("smoothed_milli")).toMap
    assert(byHour.values.min === (w - 1) * 1000L)
    assert(byHour.values.max === w * 1000L)
  }

  test("m4: champions are exact per rank-bucket, value ties pick the earliest point") {
    import spark.implicits._
    val wal = Seq(
      // bucket 0 (rn 1..3): first=(t10,5), last=(t30,1), min=(t30,1), max @5 tie → earliest t10
      (1L, "a", 10L, 0.05), (2L, "a", 20L, 0.05), (3L, "a", 30L, 0.01),
      // bucket 1 (rn 4..6): monotone rise
      (4L, "a", 40L, 0.02), (5L, "a", 50L, 0.07), (6L, "a", 60L, 0.09))
      .toDF("lsn", "event_type", "ts_ms", "value")
    val got = EventAnalytics.m4Downsample(wal, nBuckets = 2)
      .orderBy(col("bucket")).collect()
    assert(got.length === 2)
    val b0 = got(0)
    assert(b0.getAs[Long]("n_pts") === 3L)
    assert(b0.getAs[Long]("first_ts") === 10L && b0.getAs[Long]("first_v") === 5L)
    assert(b0.getAs[Long]("last_ts") === 30L && b0.getAs[Long]("last_v") === 1L)
    assert(b0.getAs[Long]("min_ts") === 30L && b0.getAs[Long]("min_v") === 1L)
    assert(b0.getAs[Long]("max_ts") === 10L && b0.getAs[Long]("max_v") === 5L,
      "equal maxima must resolve to the earliest point")
    val b1 = got(1)
    assert(b1.getAs[Long]("min_v") === 2L && b1.getAs[Long]("max_v") === 9L)
    assert(b1.getAs[Long]("first_ts") === 40L && b1.getAs[Long]("last_ts") === 60L)
    // invariant under repartition
    val again = EventAnalytics.m4Downsample(wal.repartition(5), nBuckets = 2)
      .orderBy(col("bucket")).collect().toSeq
    assert(again === got.toSeq)
  }

  test("hll rollup contract: union of part-sketches estimates like the direct sketch") {
    import spark.implicits._
    // the union estimate is NOT bit-equal to the direct sketch's (the
    // DataSketches union gadget re-targets HLL_8 and re-estimates), but
    // both must land within the lgK=12 error bound of the truth — the
    // same 5% gate the driver query hashes on
    val df = (0 until 2000).map(i => (i % 4, s"u$i")).toDF("part", "k")
    val direct = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(k))")).head.getLong(0)
    val rolled = df.groupBy(col("part")).agg(expr("hll_sketch_agg(k)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    assert(math.abs(direct - 2000L) * 20 <= 2000L, s"direct $direct outside 5% of 2000")
    assert(math.abs(rolled - 2000L) * 20 <= 2000L, s"rollup $rolled outside 5% of 2000")
    // below the coupon threshold the sketch is exact
    val small = (0 until 100).map(i => s"s$i").toDF("k")
    assert(small.agg(expr("hll_sketch_estimate(hll_sketch_agg(k))")).head.getLong(0) === 100L)
    // and the whole path is partitioning-invariant (fixed hash)
    val reparted = df.repartition(13).groupBy(col("part"))
      .agg(expr("hll_sketch_agg(k)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    assert(reparted === rolled)
  }
}
