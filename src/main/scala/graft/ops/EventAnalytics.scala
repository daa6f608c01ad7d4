package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: ordered-funnel
  * conversion and cohort retention — the two reports every
  * product-analytics engine ships (the reference's CDC events feed
  * exactly this kind of consumer downstream).
  *
  * Timestamps are LONG NANOS (`Tables.events` normalizes any parquet
  * timestamp precision to epoch-nanos longs) and every derived quantity
  * is integer arithmetic on them — engine-exact, no timezone or float
  * ambiguity.
  */
object EventAnalytics {

  /** Strict-order funnel: for each user who performed `steps.head`,
    * the earliest chain `t₁ < t₂ < … < tₖ` with every step inside
    * `windowNs` of the user's FIRST step-1 event (the standard
    * "convert within W of entry" contract), greedily matched — `tᵢ` is
    * the earliest step-i event after `tᵢ₋₁`. Greedy earliest-first is
    * the classical correct choice: if any valid chain exists, the
    * greedy one exists (exchanging any tᵢ for an earlier valid one
    * never invalidates later steps).
    *
    * Output: one row per entered user — `user_id`, `ts_1 … ts_k`
    * (nulls where the funnel stalled), `steps_completed`.
    *
    * Scale shape: one aggregate per step over the TYPE-FILTERED event
    * slice (the filter reaches the scan; non-funnel events are never
    * read into a shuffle), chained by k−1 equi-joins on `user_id` —
    * every stage is partial-agg-able min/max, no per-user arrays, no
    * windows, so a bot user with 10⁸ events costs map-side reduction,
    * not a single-task sort. k is the funnel length (tiny, fixed).
    */
  def funnel(events: DataFrame, steps: Seq[String], windowNs: Long,
             tsCol: String = "ts", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"funnel: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel: repeated step types $steps — greedy matching needs distinct types")
    require(windowNs > 0, s"funnel: windowNs=$windowNs must be positive")
    val base = events.select(col(userCol).as("user_id"),
      col(tsCol).cast("long").as("tsn"), col(typeCol).as("etype"))
    var acc = base.filter(col("etype") === steps.head)
      .groupBy(col("user_id")).agg(min(col("tsn")).as("ts_1"))
    for (i <- 1 until steps.size) {
      val cand = base.filter(col("etype") === steps(i))
        .select(col("user_id"), col("tsn"))
      val carried = (1 to i).map(j => max(col(s"ts_$j")).as(s"ts_$j"))
      // explicit aliases: acc and cand share base's lineage, so bare
      // user_id would be ambiguous in the self-derived join
      acc = acc.as("l").join(cand.as("r"),
          col("l.user_id") === col("r.user_id") &&
            col("r.tsn") > col(s"l.ts_$i") &&
            col("r.tsn") <= col("l.ts_1") + windowNs,
          "left")
        .select(col("l.user_id").as("user_id") +:
          (1 to i).map(j => col(s"l.ts_$j").as(s"ts_$j")) :+
          col("r.tsn").as("tsn"): _*)
        .groupBy(col("user_id"))
        // carried columns are single-valued per user (max = the value);
        // a stalled step leaves min(tsn) null and later steps stay null
        .agg(carried.head, carried.tail :+ min(col("tsn")).as(s"ts_${i + 1}"): _*)
    }
    val completed = (2 to steps.size)
      .map(j => when(col(s"ts_$j").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.withColumn("steps_completed", completed.cast("long"))
  }

  /** Cohort retention: users bucketed by FIRST-ACTIVITY period, then
    * the distinct-active-user count per (cohort, periods-since-cohort)
    * cell — the retention triangle. `periodNs` picks the granularity
    * (day/week); periods are `tsn div periodNs`, integer-exact.
    *
    * Scale shape: first-seen is one min-aggregate on `user_id`; the
    * join-back shuffles on the same key; the cell count is a
    * count-distinct on a (cohort, offset) key space bounded by
    * (periods)² — tiny output, partial-agg'd. No windows, no arrays.
    */
  def cohortRetention(events: DataFrame, periodNs: Long,
                      tsCol: String = "ts",
                      userCol: String = "user_id"): DataFrame = {
    require(periodNs > 0, s"cohortRetention: periodNs=$periodNs must be positive")
    val base = events.select(col(userCol).as("user_id"),
      expr(s"CAST($tsCol AS BIGINT) div ${periodNs}L").as("period"))
    val firstSeen = base.groupBy(col("user_id"))
      .agg(min(col("period")).as("cohort_period"))
    base.join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col("user_id")).as("n_active_users"))
  }

  /** TimescaleDB's signature per-bucket aggregates — `first(value, ts)`
    * / `last(value, ts)` — over the WAL's day buckets, per event type.
    * Ties on the millisecond are broken by LSN via a combined integer
    * order key `ts_ms·10⁶ + lsn` (unique, ts-major — deterministic
    * where raw `first()` is not; the oracle uses the identical key).
    * One partial-agg shuffle: min_by/max_by pre-combine map-side.
    */
  def timeBucketFirstLast(wal: DataFrame): DataFrame = {
    val ord = expr("ts_ms * 1000000 + lsn")
    wal.groupBy(col("event_type"), col("chunk_day"))
      .agg(
        min_by(col("value"), ord).as("first_value"),
        max_by(col("value"), ord).as("last_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n"))
  }

  /** `time_bucket_gapfill` + `locf()` — the other half of the
    * TimescaleDB downstream-analytics identity: a dense per-type daily
    * grid over the corpus' full day range, absent buckets at `n = 0`
    * with the value carried forward from the last observed bucket
    * (null before the first observation, locf's contract).
    *
    * Scale shape: the observed-bucket table is one partial-agg shuffle
    * (bucket count is bounded by types × days, not events); the grid is
    * a type-set × day-sequence explode against a broadcast 1-row range
    * scalar; the LOCF window partitions by type — per-partition state
    * is the day count, never event volume.
    */
  /** Dense (event_type × day) grid over the corpus' observed day range —
    * the gapfill scaffold shared by [[gapfillLocf]] and
    * [[gapfillInterpolate]]. |types|·|days| rows: dashboard-sized at any
    * corpus scale (the min/max range rides as a broadcast 1-row agg). */
  private def dayGrid(wal: DataFrame): DataFrame = {
    val range = wal.agg(min(col("chunk_day")).as("lo"), max(col("chunk_day")).as("hi"))
    wal.select(col("event_type")).distinct()
      .crossJoin(broadcast(range))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("chunk_day"))
  }

  def gapfillLocf(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = wal.groupBy(col("event_type"), col("chunk_day"))
      .agg(max_by(col("value"), expr("ts_ms * 1000000 + lsn")).as("day_last"),
        count(lit(1)).as("n"))
    dayGrid(wal).join(daily, Seq("event_type", "chunk_day"), "left")
      .select(col("event_type"), col("chunk_day"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("day_last"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("chunk_day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value_locf"))
  }

  /** `time_bucket_gapfill` → `interpolate()` analog: the LINEAR twin of
    * [[gapfillLocf]]. Missing days take the straight line between the
    * last observed day before and the first observed day after
    * (`v_prev + (v_next − v_prev) · (d − d_prev)/(d_next − d_prev)`);
    * days outside the observed range stay NULL — the toolkit's
    * `interpolate()` contract (LOCF extends forward, interpolation
    * cannot invent a slope past the last sample).
    *
    * Integer-exactness: per-day anchor values are exact milli ints
    * (`max_by` last-of-day); the interpolation division runs in DOUBLE
    * with a fixed operation order mirrored textually by the oracle twin
    * and rounds half-up to milli. Two window passes over the (type-)
    * partitioned day grid — same shuffle shape as gapfillLocf; the day
    * grid is |types|×|days| rows, a dashboard-sized frame even at 100 TB
    * of raw events (the heavy agg happened in the daily rollup).
    */
  def gapfillInterpolate(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = wal.groupBy(col("event_type"), col("chunk_day"))
      .agg(max_by(expr("cast(floor(value * 1000 + 0.5) as bigint)"),
        expr("ts_ms * 1000000 + lsn")).as("day_last_milli"),
        count(lit(1)).as("n"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("chunk_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("chunk_day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    dayGrid(wal).join(daily, Seq("event_type", "chunk_day"), "left")
      .select(col("event_type"), col("chunk_day"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("day_last_milli"),
        last(col("day_last_milli"), ignoreNulls = true).over(wPrev).as("v_prev"),
        last(when(col("day_last_milli").isNotNull, col("chunk_day")),
          ignoreNulls = true).over(wPrev).as("d_prev"),
        first(col("day_last_milli"), ignoreNulls = true).over(wNext).as("v_next"),
        first(when(col("day_last_milli").isNotNull, col("chunk_day")),
          ignoreNulls = true).over(wNext).as("d_next"))
      .withColumn("value_interp_milli", expr(
        """CASE
          |  WHEN day_last_milli IS NOT NULL THEN day_last_milli
          |  WHEN v_prev IS NOT NULL AND v_next IS NOT NULL THEN
          |    CAST(FLOOR(CAST(v_prev AS DOUBLE)
          |      + (CAST(v_next AS DOUBLE) - CAST(v_prev AS DOUBLE))
          |        * (CAST(chunk_day - d_prev AS DOUBLE)
          |           / CAST(d_next - d_prev AS DOUBLE)) + 0.5) AS BIGINT)
          |  ELSE NULL END""".stripMargin))
      .select(col("event_type"), col("chunk_day"), col("n"),
        col("value_interp_milli"))
  }

  /** TimescaleDB `time_weight('LOCF', …)` analog per (type, day bucket):
    * each observation's value holds until the next one, so the
    * time-weighted integral over the bucket's OBSERVED span is
    * `Σ vᵢ·(tᵢ₊₁−tᵢ)`. Division is refused (float ratios are not
    * engine-exact); the output is the exact integer pair — numerator in
    * milli-value·ms units plus the span — and the caller divides.
    * Milli (not micro) value units keep the worst-case bucket
    * (10⁶ rows × day-span products) inside int64.
    * One window shuffle on (type, day); lead() is per-partition.
    */
  def timeWeighted(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("chunk_day"))
      .orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(
        sum(when(col("next_ts").isNotNull,
          col("v_milli") * (col("next_ts") - col("ts_ms"))).otherwise(0L))
          .as("weighted_milli_ms"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("span_ms"),
        count(lit(1)).as("n"))
  }

  /** `interpolated_average` analog (TimescaleDB hyperfunction): the
    * time-weighted LOCF average per (type, day) where a held value
    * CARRIES ACROSS bucket boundaries — the plain [[timeWeighted]]
    * truncates each day's integral at its first/last sample, this one
    * charges every day for the exact portion of each hold-interval that
    * overlaps it. Each event's hold span `[ts, next_ts)` (lead over the
    * per-type global order) explodes over the days it touches and is
    * clipped to each; all integer ms × milli-value arithmetic, average
    * exposed as micro-units by integer division.
    *
    * Scale shape: one window shuffle on the type key; the explode
    * fan-out is `ceil(span/day)` — bounded by the ingest cadence (a
    * type quiet for a year fans 365 rows once, not per event), and the
    * groupBy after it is a partial agg on (type, day).
    */
  def timeWeightedInterpolated(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayMs = 86400000L
    val w = Window.partitionBy(col("event_type"))
      .orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      // zero-length holds (ts ties) carry no weight; the last event's
      // open hold is excluded, matching the bounded-integral contract
      .filter(col("next_ts").isNotNull && col("next_ts") > col("ts_ms"))
      .withColumn("day", explode(expr(
        s"sequence(ts_ms div $dayMs, (next_ts - 1) div $dayMs)")))
      .withColumn("seg_ms",
        least(col("next_ts"), (col("day") + 1) * dayMs) -
          greatest(col("ts_ms"), col("day") * dayMs))
      .groupBy(col("event_type"),
        (col("day") - graft.cdc.Cdc.EpochDay20240101).cast("int").as("chunk_day"))
      .agg(
        sum(col("v_milli") * col("seg_ms")).as("weighted_milli_ms"),
        sum(col("seg_ms")).as("covered_ms"),
        count(lit(1)).as("n_segs"))
      .withColumn("twa_micro",
        expr("weighted_milli_ms * 1000 div nullif(covered_ms, 0)"))
  }

  /** `approx_percentile` analog on ENGINE-EXACT parts (HDR-histogram
    * bucketing, Tene's public HdrHistogram idea): values integerize to
    * cents, shift by +1 (zero-safe), and land in log₂ buckets keyed by
    * the most significant bit — computed as `length(conv(x, 10, 2)) - 1`,
    * an integer/string op both engines evaluate identically (a float
    * `log2` would disagree at boundaries). Bucket counts are the whole
    * sketch: mergeable by addition (rollup contract), ≤ 64 rows per
    * group no matter the input size. Quantiles interpolate linearly
    * inside the bucket with integer division: for 1-based rank r in a
    * bucket [2^b, 2^(b+1)) holding `cnt` values with `cum` cumulative,
    * estimate = 2^b + ((r - cum + cnt) · 2^b) div cnt − 1 (the −1 undoes
    * the shift). Relative error ≤ 2× (one bucket), the classic HDR
    * trade; exactness of the ARITHMETIC is what the oracle checks.
    *
    * Scale shape: one partial-agg shuffle to ≤ 64 rows/group, a window
    * over those rows, and a quantile-list explode against them — the
    * sketch is dashboard-sized however large the corpus.
    */
  def hdrQuantiles(wal: DataFrame, percentiles: Seq[Int] = Seq(50, 90, 99),
                   groupCol: String = "event_type"): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"hdrQuantiles: percentiles must be in [1,100], got $percentiles")
    import org.apache.spark.sql.expressions.Window
    // the power-of-two bucket (bit length of shifted) is only meaningful
    // for POSITIVE shifted cents: conv() of a negative bigint renders
    // 64 two's-complement bits (bucket 63 → Long.MinValue-scale garbage
    // estimates) and a null groups as its own phantom bucket — fail
    // loudly on both instead of silently corrupting every percentile
    val buckets = wal
      .select(col(groupCol),
        expr("""CASE WHEN value IS NOT NULL AND floor(value * 100 + 0.5) + 1 > 0
               |  THEN cast(floor(value * 100 + 0.5) as bigint) + 1
               |  ELSE cast(assert_true(false,
               |    'hdrQuantiles: value must be non-null and > -0.005 (positive shifted cents)') as bigint)
               |END""".stripMargin).as("shifted"))
      .groupBy(col(groupCol),
        (length(conv(col("shifted"), 10, 2)) - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val ps = percentiles.map(p => lit(p)) // config-sized
    cum
      .withColumn("p", explode(array(ps: _*)))
      .withColumn("rank", expr("(total * p + 99) div 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col(groupCol), col("p"))
      .agg(min_by(struct(col("bucket"), col("cnt"), col("cum"), col("total")),
        col("bucket")).as("__hit"))
      .select(col(groupCol), col("p"),
        col("__hit.total").as("n"),
        col("__hit.bucket").as("bucket"),
        expr("""shiftleft(1L, __hit.bucket)
               | + ((((__hit.total * p + 99) div 100) - __hit.cum + __hit.cnt)
               |    * shiftleft(1L, __hit.bucket)) div __hit.cnt
               | - 1""".stripMargin).as("approx_cents"))
  }

  /** Seasonality profile — the (day-of-week × hour) activity matrix
    * every ops dashboard draws: integer epoch arithmetic only
    * (`dow = (epoch_days + 4) mod 7`, Thursday-anchored; hour from ms),
    * one (type, dow, hour) partial agg.
    */
  def seasonality(wal: DataFrame): DataFrame =
    wal.groupBy(col("event_type"),
        expr("(ts_ms div 86400000 + 4) % 7").as("dow"),
        expr("(ts_ms div 3600000) % 24").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 1000000 + 0.5) as bigint)")).as("sum_micros"))

  /** CUSUM change-point statistic per event type — exact integers: with
    * per-type totals `(S, n)` and running prefix `(cᵢ, i)`, the scaled
    * deviation `n·cᵢ − i·S` is the classic mean-shift CUSUM numerator
    * times `n` (no rational mean needed). Output per type: the max
    * |deviation|, WHERE it peaks (the candidate change point, earliest
    * lsn on ties), and the totals to rescale by. One per-type window.
    * Magnitude bound: n·cᵢ ≤ 10⁵·(10⁵·10⁹) = 10¹⁹ overflows at extreme
    * corpus sizes — divide value units or shard by time first; at bench
    * scale ≤ 10¹⁶.
    */
  def cusumChangePoint(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("lsn"))
    val vm = wal.withColumn("vm", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
    val pref = vm
      .withColumn("c", sum(col("vm")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i", row_number().over(w).cast("long"))
    val totals = vm.groupBy(col("event_type"))
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
    pref.join(broadcast(totals), "event_type")
      .withColumn("dev", abs(col("n") * col("c") - col("i") * col("s")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("dev").desc, col("lsn"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("lsn").as("change_lsn"),
        col("dev").as("max_dev"), col("n"), col("s").as("sum_milli"))
  }

  /** TimescaleDB `histogram(value, min, max, nbuckets)` analog per
    * event type: fixed equal-width buckets over `[loMicros, hiMicros)`
    * in integer micro-values, with the hyperfunction's underflow (−1)
    * and overflow (`nBuckets`) buckets. Pure integer bucket arithmetic
    * (`(v−lo)·n div (hi−lo)`) — engine-exact, no float edges; one
    * partial-agg shuffle on (type, bucket).
    */
  def valueHistogram(wal: DataFrame, loMicros: Long, hiMicros: Long,
                     nBuckets: Int): DataFrame = {
    require(hiMicros > loMicros && nBuckets > 0, "histogram: bad bounds")
    wal
      .withColumn("vm", expr("cast(floor(value * 1000000 + 0.5) as bigint)"))
      .withColumn("bucket",
        when(col("vm") < loMicros, lit(-1))
          .when(col("vm") >= hiMicros, lit(nBuckets))
          .otherwise(expr(
            s"cast((vm - $loMicros) * $nBuckets div ($hiMicros - $loMicros) as int)")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** `gauge_agg → idelta_right` / PromQL `idelta`/`irate` analog: the
    * INSTANT rate from the last two samples per series — the "what is it
    * doing right now" accessor, vs [[counterIncreaseExtrapolated]]'s
    * whole-bucket view. Emits both conventions from the same pair:
    * gauge idelta (signed, no reset logic) and counter irate
    * (a drop reads as a restart, so the new value counts whole).
    * Integer-exact deltas; the per-second rates divide in DOUBLE with a
    * fixed order and floor to micro-units/s. Series with one sample drop
    * out (no pair exists); a zero time step yields NULL rates.
    * One window shuffle on the series key, then a 1-row-per-key agg.
    */
  def instantRate(wal: DataFrame, keyCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("prev_v", lag(col("v_milli"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(col("v_milli"), col("prev_v"), col("ts_ms"), col("prev_ts")),
        expr("ts_ms * 1000000 + lsn")).as("lastPair"))
      .select(col(keyCol),
        expr("lastPair.v_milli - lastPair.prev_v").as("idelta_milli"),
        expr("lastPair.ts_ms - lastPair.prev_ts").as("dt_ms"),
        expr("""CASE WHEN lastPair.v_milli >= lastPair.prev_v
                |  THEN lastPair.v_milli - lastPair.prev_v
                |  ELSE lastPair.v_milli END""".stripMargin).as("counter_idelta_milli"))
      .withColumn("irate_micro", expr(
        """CASE WHEN dt_ms > 0 THEN
          |  CAST(FLOOR(CAST(idelta_milli AS DOUBLE) / CAST(dt_ms AS DOUBLE)
          |             * 1000000.0 + 0.5) AS BIGINT)
          |ELSE NULL END""".stripMargin))
      .withColumn("counter_irate_micro", expr(
        """CASE WHEN dt_ms > 0 THEN
          |  CAST(FLOOR(CAST(counter_idelta_milli AS DOUBLE) / CAST(dt_ms AS DOUBLE)
          |             * 1000000.0 + 0.5) AS BIGINT)
          |ELSE NULL END""".stripMargin))
  }

  /** TimescaleDB `counter_agg` → `extrapolated_delta('prometheus')`
    * analog: per (type, day bucket), the reset-adjusted counter increase
    * EXTRAPOLATED to the bucket bounds the way Prometheus' `increase`
    * does (promql extrapolatedRate): observed delta scaled by how far
    * the bucket edges extend past the first/last samples — but never
    * further than 1.1× the average sample spacing on each edge (beyond
    * that, half a spacing), and never past the counter's implied zero
    * crossing (`sampled · v_first/delta`).
    *
    * Exactness strategy: the ACCUMULATOR (n, n_resets, delta_milli,
    * first/last ts, v_first) is integer-exact; the extrapolation factor
    * then runs in DOUBLE with a FIXED operation order — each
    * intermediate is its own column, so the DuckDB twin can evaluate the
    * byte-identical expression text and land on the same IEEE result —
    * and floors to micro units. Buckets with <2 samples (or zero span)
    * yield NULL: no rate is defined there (Prometheus drops them too).
    * One window shuffle on (type, day), then a partial agg — same cost
    * shape as [[counterDelta]].
    */
  def counterIncreaseExtrapolated(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("chunk_day"))
      .orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("prev", lag(col("v_milli"), 1).over(w))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("prev").isNotNull && col("v_milli") < col("prev"), 1L)
          .otherwise(0L)).as("n_resets"),
        // telescopes to v_last - v_first + Σ(pre-reset levels): the
        // exact quantity Prometheus extrapolates
        sum(when(col("prev").isNull, 0L)
          .when(col("v_milli") >= col("prev"), col("v_milli") - col("prev"))
          .otherwise(col("v_milli"))).as("delta_milli"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"),
        min_by(col("v_milli"), expr("ts_ms * 1000000 + lsn")).as("v_first"))
      .withColumn("range_start", expr(
        s"(cast(chunk_day as bigint) + ${graft.cdc.Cdc.EpochDay20240101}) * 86400000"))
      .withColumn("range_end", expr("range_start + 86400000"))
      // ---- the double-math ladder: ONE definition per intermediate,
      // mirrored textually by the oracle twin ----
      .withColumn("sampled_d", expr("CAST(last_ts - first_ts AS DOUBLE)"))
      // n=1 guarded HERE, not just at the output: ANSI mode raises on
      // the double division even though the final CASE would mask it
      .withColumn("avg_d", expr(
        "CASE WHEN n >= 2 THEN sampled_d / CAST(n - 1 AS DOUBLE) ELSE 0.0 END"))
      .withColumn("to_start0_d", expr("CAST(first_ts - range_start AS DOUBLE)"))
      .withColumn("to_end_d", expr("CAST(range_end - last_ts AS DOUBLE)"))
      .withColumn("to_zero_d", expr(
        """CASE WHEN delta_milli > 0 AND v_first >= 0
          |  THEN sampled_d * (CAST(v_first AS DOUBLE) / CAST(delta_milli AS DOUBLE))
          |  ELSE to_start0_d END""".stripMargin))
      .withColumn("to_start_d", expr("LEAST(to_start0_d, to_zero_d)"))
      .withColumn("extrap_d", expr(
        """sampled_d
          |  + (CASE WHEN to_start_d < avg_d * 1.1 THEN to_start_d ELSE avg_d / 2.0 END)
          |  + (CASE WHEN to_end_d < avg_d * 1.1 THEN to_end_d ELSE avg_d / 2.0 END)"""
          .stripMargin))
      .withColumn("increase_micro", expr(
        """CASE WHEN n >= 2 AND last_ts > first_ts
          |  THEN CAST(FLOOR(CAST(delta_milli AS DOUBLE) * (extrap_d / sampled_d)
          |                  * 1000.0 + 0.5) AS BIGINT)
          |  ELSE NULL END""".stripMargin))
      .select(col("event_type"), col("chunk_day"), col("n"), col("n_resets"),
        col("delta_milli"), col("increase_micro"))
  }

  /** TimescaleDB `counter_agg` → `delta()` analog: per key, the counter
    * increase over the stream with RESET handling — a drop between
    * consecutive readings means the counter restarted, so the new
    * reading contributes whole (the Prometheus/Timescale convention).
    * Integer milli-values; one window shuffle on the key.
    */
  def counterDelta(wal: DataFrame, keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("prev", lag(col("v_milli"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("prev").isNull, 0L) // first reading establishes the level
          .when(col("v_milli") >= col("prev"), col("v_milli") - col("prev"))
          .otherwise(col("v_milli"))).as("delta_milli"),
        sum(when(col("prev").isNotNull && col("v_milli") < col("prev"), 1L)
          .otherwise(0L)).as("n_resets"),
        count(lit(1)).as("n"))
  }

  /** `gauge_agg` analog (TimescaleDB toolkit hyperfunction): counter_agg
    * for metrics that legitimately DECREASE — no reset interpretation,
    * deltas keep their sign. Per (type, day bucket): `delta()` (signed
    * last − first), `idelta_left`/`idelta_right` (the instantaneous
    * delta at the bucket's first/last sample pair), and
    * `irate_left`/`irate_right` (those deltas over their timestamp
    * gaps, micro-units/ms). Integer milli accumulators; the rates
    * divide in DOUBLE with a fixed operation order then floor to micro
    * (the counterIncreaseExtrapolated stance), so the DuckDB twin lands
    * on the identical IEEE result. Buckets with one sample have no
    * pair: idelta/irate are NULL there (delta is 0 — first == last).
    * Zero-gap pairs rate to NULL, never a division error.
    *
    * Scale shape: one window shuffle on (type, day) for the lag pairs,
    * then one partial agg on the same key — the window partitioning is
    * reused by the groupBy (no second exchange), same cost shape as
    * counterDelta.
    */
  def gaugeAgg(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("chunk_day"))
      .orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("ord", expr("ts_ms * 1000000 + lsn"))
      .withColumn("v_milli", expr("cast(floor(value * 1000 + 0.5) as bigint)"))
      .withColumn("prev_v", lag(col("v_milli"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("v_milli"), col("ord")).as("v_first"),
        max_by(col("v_milli"), col("ord")).as("v_last"),
        // the first/last PAIR: rows without a predecessor order last /
        // first via the sign-flipped sentinel, and the CASE below nulls
        // single-sample buckets before the sentinel could leak
        min_by(struct(col("v_milli"), col("prev_v"), col("ts_ms"), col("prev_ts")),
          when(col("prev_v").isNotNull, col("ord"))
            .otherwise(lit(Long.MaxValue))).as("lp"),
        max_by(struct(col("v_milli"), col("prev_v"), col("ts_ms"), col("prev_ts")),
          when(col("prev_v").isNotNull, col("ord"))
            .otherwise(lit(Long.MinValue))).as("rp"))
      .select(col("event_type"), col("chunk_day"), col("n"),
        expr("v_last - v_first").as("delta_milli"),
        expr("CASE WHEN n >= 2 THEN lp.v_milli - lp.prev_v END").as("idelta_left_milli"),
        expr("CASE WHEN n >= 2 THEN rp.v_milli - rp.prev_v END").as("idelta_right_milli"),
        expr("""CASE WHEN n >= 2 AND lp.ts_ms > lp.prev_ts THEN
               |  CAST(FLOOR(CAST(lp.v_milli - lp.prev_v AS DOUBLE)
               |             / CAST(lp.ts_ms - lp.prev_ts AS DOUBLE)
               |             * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin)
          .as("irate_left_micro"),
        expr("""CASE WHEN n >= 2 AND rp.ts_ms > rp.prev_ts THEN
               |  CAST(FLOOR(CAST(rp.v_milli - rp.prev_v AS DOUBLE)
               |             / CAST(rp.ts_ms - rp.prev_ts AS DOUBLE)
               |             * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin)
          .as("irate_right_micro"))
  }

  /** `time_weight` analog (TimescaleDB toolkit `time_weight('LOCF'|
    * 'Linear', ts, value)` + `average` accessor): per (type, day) the
    * time-weighted average under both weighting methods — the number
    * that makes irregularly-sampled gauges comparable (an arithmetic
    * mean over-weights burst periods).
    *
    * Integer-exact cross-engine: values floor to centi-units, each
    * LOCF segment contributes `v·Δt`, each Linear (trapezoid) segment
    * `(v+v')·Δt` (the ×2 numerator folds into the final ÷2), sums ride
    * DECIMAL(38,0) (a day of millisecond-spaced points stays exact
    * where an i64 sum could wrap at production densities), and the
    * single integral division to milli-cents happens once at the end —
    * no doubles anywhere, so the oracle replays bit-exactly via
    * HUGEINT. Single-point buckets have zero duration → NULL average,
    * the toolkit's contract. One window + one partial-agg shuffle on
    * (type, day).
    */
  def timeWeightedAvg(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("chunk_day"))
      .orderBy(expr("ts_ms * 1000000 + lsn"))
    wal.filter(col("value").isNotNull)
      // non-negative contract (same fail-loud posture as the HDR
      // family): a negative integral would hit the floor-vs-truncate
      // signed-division divergence between engines — refuse loudly
      // rather than return engine-dependent averages
      .withColumn("v_cents", expr(
        """CASE WHEN floor(value * 100 + 0.5) >= 0
          |  THEN cast(floor(value * 100 + 0.5) as bigint)
          |  ELSE cast(assert_true(false,
          |    'timeWeightedAvg: negative gauge value — signed integral division is engine-dependent') as bigint)
          |END""".stripMargin))
      .withColumn("next_v", lead(col("v_cents"), 1).over(w))
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(
        count(lit(1)).as("n_points"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("den_ms"),
        sum(when(col("next_ts").isNotNull,
          col("v_cents").cast("decimal(38,0)") * (col("next_ts") - col("ts_ms")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__num_locf"),
        sum(when(col("next_ts").isNotNull,
          (col("v_cents") + col("next_v")).cast("decimal(38,0)") * (col("next_ts") - col("ts_ms")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__num_lin2x"))
      .select(col("event_type"), col("chunk_day"), col("n_points"), col("den_ms"),
        expr("""CASE WHEN den_ms > 0
               |  THEN CAST((__num_locf * 1000) div den_ms AS BIGINT) END""".stripMargin)
          .as("twa_locf_millicents"),
        expr("""CASE WHEN den_ms > 0
               |  THEN CAST((__num_lin2x * 500) div den_ms AS BIGINT) END""".stripMargin)
          .as("twa_linear_millicents"))
  }

  /** `stats_agg` 2-D analog (TimescaleDB hyperfunction): per type, the
    * exact integer REGRESSION ACCUMULATOR (n, Σx, Σy, Σxy, Σx², Σy²) —
    * which is all stats_agg stores — plus the slope/intercept accessors
    * scaled to micro units. x = minutes since the corpus' first event
    * (the broadcast 1-row min), y = value milli-units; centering x keeps
    * every sum exact in 64 bits through ~10⁹ rows × multi-year spans.
    * The accessors divide in DOUBLE from the exact sums with a fixed
    * operation order, so both engines execute the identical IEEE
    * sequence — bit-equal, then floor-scaled to integers. Accumulator
    * rows MERGE by adding (the rollup() contract): re-aggregating these
    * sums over coarser groups is exact.
    * One partial-agg shuffle; the min rides as a broadcast scalar.
    */
  def statsAgg(wal: DataFrame,
               groupCols: Seq[String] = Seq("event_type")): DataFrame = {
    require(groupCols.nonEmpty, "statsAgg: need at least one group column")
    val t0 = wal.agg(min(col("ts_ms")).as("__t0"))
    wal.crossJoin(broadcast(t0))
      .select((groupCols.map(col) ++ Seq(
        expr("(ts_ms - __t0) div 60000").as("x"),
        expr("cast(floor(value * 1000 + 0.5) as bigint)").as("y"))): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"))
      .withColumn("slope_micro", expr(
        """CASE WHEN CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
          |          - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) = 0.0 THEN 0
          |     ELSE CAST(FLOOR(
          |       (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
          |          - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
          |       / (CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
          |          - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
          |       * 1000000.0 + 0.5) AS BIGINT) END""".stripMargin))
      .withColumn("intercept_milli", expr(
        """CASE WHEN n = 0 THEN 0
          |     ELSE CAST(FLOOR(
          |       (CAST(sum_y AS DOUBLE) - CAST(slope_micro AS DOUBLE) / 1000000.0
          |          * CAST(sum_x AS DOUBLE)) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) END"""
          .stripMargin))
  }

  /** `state_agg` analog (TimescaleDB hyperfunction): time spent in each
    * state, where a user is "in" state e from an event of type e until
    * their next event (LOCF state semantics; each user's last interval
    * is open and excluded, its count reported separately). One window
    * shuffle on the user key, then a partial agg per state.
    */
  def stateAgg(wal: DataFrame, keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("next_ts").isNotNull, col("next_ts") - col("ts_ms"))
          .otherwise(0L)).as("total_ms"),
        sum(when(col("next_ts").isNotNull, 1L).otherwise(0L)).as("n_intervals"),
        sum(when(col("next_type").isNotNull && col("next_type") =!= col("event_type"), 1L)
          .otherwise(0L)).as("n_transitions_out"),
        sum(when(col("next_ts").isNull, 1L).otherwise(0L)).as("n_open"))
  }

  /** `state_agg → state_timeline()` analog (TimescaleDB toolkit
    * accessor): the contiguous state PERIODS, not just total durations —
    * per key, consecutive same-state events run-length encode into
    * `(period, state, start_ms, end_ms, n_events)` with the toolkit's
    * [start, end) convention: a period ends where the next one starts;
    * the last period closes at its own last observation (no open-ended
    * extrapolation, the stateAgg open-interval stance). Periods number
    * 1..k per key in time order — the classic change-flag running sum,
    * integer-exact, ties broken by lsn.
    *
    * Scale shape: the lag + running-sum windows share one (key) shuffle
    * and sort; the period agg and the lead over period-level rows keep
    * the same key partitioning (period rows per key are run-count-sized,
    * not event-sized).
    */
  def stateTimeline(wal: DataFrame, keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    val wp = Window.partitionBy(col(keyCol)).orderBy(col("period"))
    wal
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("period", sum(col("chg")).over(w))
      .groupBy(col(keyCol), col("period"), col("event_type").as("state"))
      .agg(min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("last_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("end_ms",
        coalesce(lead(col("start_ms"), 1).over(wp), col("last_ms")))
      .select(col(keyCol), col("period"), col("state"),
        col("start_ms"), col("end_ms"),
        expr("end_ms - start_ms").as("duration_ms"), col("n_events"))
  }

  /** `state_agg → interpolated_duration_in` analog (TimescaleDB toolkit
    * accessor): per-(state, day bucket) dwell time where a held state
    * CARRIES ACROSS bucket boundaries — [[stateAgg]] reports whole-
    * stream totals; this charges every day for the exact portion of
    * each per-key LOCF hold `[ts, next_ts)` that overlaps it (the
    * toolkit's interpolated accessor semantics, the same clipping
    * arithmetic as [[timeWeightedInterpolated]]). Open last intervals
    * are excluded — the bounded-integral contract stateAgg documents.
    *
    * Scale shape: one window shuffle on the key; the explode fan-out is
    * `ceil(span/day)` — bounded by ingest cadence, not data size — and
    * the groupBy after it is a partial agg on (state, day).
    */
  def interpolatedDurationIn(wal: DataFrame, keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayMs = 86400000L
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .filter(col("next_ts").isNotNull && col("next_ts") > col("ts_ms"))
      .withColumn("day", explode(expr(
        s"sequence(ts_ms div $dayMs, (next_ts - 1) div $dayMs)")))
      .withColumn("seg_ms",
        least(col("next_ts"), (col("day") + 1) * dayMs) -
          greatest(col("ts_ms"), col("day") * dayMs))
      .groupBy(col("event_type").as("state"),
        (col("day") - graft.cdc.Cdc.EpochDay20240101).cast("int").as("chunk_day"))
      .agg(sum(col("seg_ms")).as("duration_ms"),
        count(lit(1)).as("n_segments"))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    * TimescaleDB ships it as the `lttb` hyperfunction), in its
    * bucket-centroid PARALLEL form: the classic algorithm anchors each
    * bucket's triangle on the PREVIOUSLY SELECTED point (inherently
    * sequential); anchoring on the neighbor buckets' centroids instead
    * (the standard parallelization, also what LTTB uses for its
    * right anchor) makes every bucket independent — one window shuffle
    * + one tiny centroid table, no driver loop, and ≤2× the classic
    * form's triangle-area loss on any input since centroids are within
    * the neighbor bucket's hull.
    *
    * Integer-exact argmax: with prev anchor (X₁/n₁, Y₁/n₁), next
    * (X₂/n₂, Y₂/n₂) and candidate (x,y), area·2·n₁·n₂ =
    * |(X₁−x·n₁)(Y₂−y·n₂) − (X₂−x·n₂)(Y₁−y·n₁)| — n₁·n₂ is constant
    * within a bucket, so the scaled comparison picks the true argmax
    * with NO rational arithmetic. Magnitude contract: with x in minutes
    * centered per corpus and y in centi-units,
    * |term| ≤ n·(bucket span in minutes + y range) — overflow-safe
    * through ~10⁶-row buckets on multi-year ranges; first/last series
    * points anchor the edge buckets (n=1), matching LTTB's kept
    * endpoints. Ties break to the earliest (ts, lsn).
    */
  def lttbDownsample(wal: DataFrame, nBuckets: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 2, s"lttb: nBuckets=$nBuckets must be >= 2")
    val t0 = wal.agg(min(col("ts_ms")).as("__t0"))
    val pts = wal.crossJoin(broadcast(t0))
      .select(col("event_type"), col("ts_ms"), col("lsn"),
        expr("(ts_ms - __t0) div 60000").as("x"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_ms"), col("lsn"))
    val wAll = Window.partitionBy(col("event_type"))
    val bucketed = pts
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket", expr(s"((__rn - 1) * $nBuckets) div __n"))
    val centroids = bucketed.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("x")).as("cx"), sum(col("y")).as("cy"), count(lit(1)).as("cn"))
    val ends = bucketed.groupBy(col("event_type"))
      .agg(min_by(struct(col("x"), col("y")), struct(col("ts_ms"), col("lsn"))).as("__f"),
        max_by(struct(col("x"), col("y")), struct(col("ts_ms"), col("lsn"))).as("__l"),
        max(col("bucket")).as("__maxb"))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val anchors = centroids
      .withColumn("px", lag(col("cx"), 1).over(wb))
      .withColumn("py", lag(col("cy"), 1).over(wb))
      .withColumn("pn", lag(col("cn"), 1).over(wb))
      .withColumn("nx", lead(col("cx"), 1).over(wb))
      .withColumn("ny", lead(col("cy"), 1).over(wb))
      .withColumn("nn", lead(col("cn"), 1).over(wb))
      .join(ends, Seq("event_type"))
      .select(col("event_type"), col("bucket"),
        coalesce(col("px"), col("__f").getField("x")).as("px"),
        coalesce(col("py"), col("__f").getField("y")).as("py"),
        coalesce(col("pn"), lit(1L)).as("pn"),
        coalesce(col("nx"), col("__l").getField("x")).as("nx"),
        coalesce(col("ny"), col("__l").getField("y")).as("ny"),
        coalesce(col("nn"), lit(1L)).as("nn"))
    bucketed.join(broadcast(anchors), Seq("event_type", "bucket"))
      .withColumn("area2", abs(
        (col("px") - col("x") * col("pn")) * (col("ny") - col("y") * col("nn")) -
        (col("nx") - col("x") * col("nn")) * (col("py") - col("y") * col("pn"))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max_by(struct(col("ts_ms"), col("lsn"), col("y")),
        struct(col("area2"), -col("ts_ms"), -col("lsn"))).as("__pick"))
      .select(col("event_type"), col("bucket"),
        col("__pick").getField("ts_ms").as("ts_ms"),
        col("__pick").getField("lsn").as("lsn"),
        col("__pick").getField("y").as("v_centi"))
  }

  /** `candlestick_agg` analog (TimescaleDB hyperfunction): per
    * (type, day) OHLC bar over tick data — open/close picked by the
    * ts·10⁶+lsn total order, high/low, traded volume (the `props.k`
    * integer plays the per-tick volume), and VWAP. Everything integer:
    * prices as cents, VWAP as micro-dollars via integer division of the
    * exact notional sum — engine-exact, accumulator rows merge by
    * min/max/sum (the rollup() contract), so re-bucketing day bars to
    * weeks is a plain re-aggregation.
    * One partial-agg shuffle; no windows, no per-group state.
    */
  def candlestick(wal: DataFrame): DataFrame = {
    val ord = expr("ts_ms * 1000000 + lsn")
    wal.select(col("event_type"), col("chunk_day"), col("ts_ms"), col("lsn"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("cents"),
        graft.types.PgConverters.jsonGet(col("props"), "$.k").cast("long").as("vol"))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(
        min_by(col("cents"), ord).as("open_cents"),
        max_by(col("cents"), ord).as("close_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        min(ord).as("open_ord"),
        max(ord).as("close_ord"),
        count(lit(1)).as("n_ticks"),
        sum(col("vol")).as("volume"),
        sum(col("cents") * col("vol")).as("notional_cents"))
      .withColumn("vwap_micro",
        expr("notional_cents * 10000 div nullif(volume, 0)"))
  }

  /** `saturating_{add,sub,mul}` / `saturating_{add,sub}_pos` analogs
    * (TimescaleDB toolkit's i32 saturating math, used by counter
    * pipelines that must clamp instead of wrap or error): the operands
    * are i32s, the arithmetic runs in BIGINT (no intermediate overflow
    * for any i32 pair, including mul), and the result clamps to the i32
    * range — the `_pos` forms clamp below at 0 instead. Pure codegen'd
    * column expressions, no UDF.
    */
  private def clampI32(e: Column): Column =
    least(greatest(e, lit(Int.MinValue.toLong)), lit(Int.MaxValue.toLong)).cast("int")
  private def clampPos(e: Column): Column =
    least(greatest(e, lit(0L)), lit(Int.MaxValue.toLong)).cast("int")
  def saturatingAdd(a: Column, b: Column): Column =
    clampI32(a.cast("long") + b.cast("long"))
  def saturatingSub(a: Column, b: Column): Column =
    clampI32(a.cast("long") - b.cast("long"))
  def saturatingMul(a: Column, b: Column): Column =
    clampI32(a.cast("long") * b.cast("long"))
  def saturatingAddPos(a: Column, b: Column): Column =
    clampPos(a.cast("long") + b.cast("long"))
  def saturatingSubPos(a: Column, b: Column): Column =
    clampPos(a.cast("long") - b.cast("long"))

  /** `rollup(candlestick_agg)` analog (TimescaleDB toolkit): weekly
    * candles re-aggregated FROM the daily candle rows, never from raw
    * ticks — the hierarchical-cagg geometry. [[candlestick]] keeps
    * `open_ord`/`close_ord` precisely so its rows form a mergeable
    * state: open = arg-min by open_ord, close = arg-max by close_ord,
    * high/low = max/min, tick/volume/notional sums add, and VWAP
    * re-derives from the merged sums (never averaged-of-averages).
    * The spec proves merge ≡ from-scratch weekly — the rollup()
    * contract; the oracle IS the from-scratch weekly, so the driver
    * gate re-proves it at every SF.
    *
    * Scale shape: input is candle-count-sized (types × days), not
    * tick-sized — one tiny partial agg.
    */
  def candlestickRollup(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"), expr("chunk_day div 7").as("chunk_week"))
      .agg(
        min_by(col("open_cents"), col("open_ord")).as("open_cents"),
        max_by(col("close_cents"), col("close_ord")).as("close_cents"),
        max(col("high_cents")).as("high_cents"),
        min(col("low_cents")).as("low_cents"),
        min(col("open_ord")).as("open_ord"),
        max(col("close_ord")).as("close_ord"),
        sum(col("n_ticks")).as("n_ticks"),
        sum(col("volume")).as("volume"),
        sum(col("notional_cents")).as("notional_cents"))
      .withColumn("vwap_micro",
        expr("notional_cents * 10000 div nullif(volume, 0)"))

  /** `heartbeat_agg` analog (TimescaleDB hyperfunction): each event is a
    * liveness heartbeat asserting its key alive for `ttlMs` after it;
    * overlapping assertions merge. Per key: total uptime, interval
    * count (= 1 + number of TTL-exceeding gaps), longest dead gap, and
    * first/last seen — the toolkit's `uptime`/`num_gaps`/`num_live_ranges`
    * accessor set. A heartbeat's contribution is `min(gap_to_next, ttl)`
    * (exactly the merged-interval measure, no interval materialization),
    * the final beat contributes its full TTL.
    * One window shuffle on the key; per-row state is a single lag — a
    * key with 10⁸ beats costs a sort, never an array.
    */
  def heartbeatAgg(wal: DataFrame, ttlMs: Long,
                   keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(expr("ts_ms * 1000000 + lsn"))
    wal
      .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .withColumn("gap", col("next_ts") - col("ts_ms"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_beats"),
        min(col("ts_ms")).as("first_seen_ms"),
        max(col("ts_ms")).as("last_seen_ms"),
        // the null-gap (final) beat is excluded EXPLICITLY: Spark's
        // `least` skips nulls (it would silently count ttl for the last
        // beat), so the guard keeps Spark and the SQL twin on the same
        // arithmetic; the final beat's TTL is the `+ ttlMs` term
        (coalesce(sum(when(col("gap").isNotNull,
            least(col("gap"), lit(ttlMs)))), lit(0L)) + ttlMs)
          .as("uptime_ms"),
        (sum(when(col("gap") > ttlMs, 1).otherwise(0)) + 1).as("num_live_ranges"),
        max(when(col("gap") > ttlMs, col("gap"))).as("longest_gap_ms"))
      .withColumn("downtime_ms",
        col("last_seen_ms") - col("first_seen_ms") + ttlMs - col("uptime_ms"))
  }

  /** `asap_smooth` analog (TimescaleDB toolkit downsample; Rong &
    * Bailis, "ASAP: Prioritizing Attention via Time Series Smoothing",
    * VLDB 2017): smooth a per-type hourly series with the moving-average
    * window that minimizes roughness — ASAP's core observation is that a
    * window aligned to the series' seasonality removes the most visual
    * noise, and argmin-roughness over a candidate grid finds it without
    * an explicit autocorrelation pass.
    *
    * Integer-exact formulation: the series is the per-(type, hour) SUM
    * of milli-values over a DENSIFIED hour axis (missing hours = 0), so
    * the W-hour moving sum telescopes — `S_i − S_{i−1} = x_i − x_{i−W}`
    * — and roughness(W) = Σ (S_i − S_{i−1})² is exact decimal arithmetic
    * (the square of an hourly diff overflows Long at sf ≥ 0.1; both
    * engines compute it in wide integers). The winner is the candidate
    * with minimal roughness, ties to the SMALLER window (less smoothing
    * when equal). Output: the winning window's full-frame smoothed
    * series per type.
    *
    * Scale shape: everything after the first partial agg operates on the
    * BUCKETED series (types × hours — dashboard-sized, not corpus-
    * sized); the candidate sweep is a union of |W| window passes over
    * that aggregate, and the bounds join is a broadcast. At 100 TB the
    * corpus is read once, shuffled once (the hour agg); nothing
    * downstream scales with row count.
    */
  def asapSmooth(wal: DataFrame,
                 candidates: Seq[Int] = Seq(2, 3, 4, 6, 8, 12, 24)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(candidates.nonEmpty && candidates.forall(_ >= 2),
      s"asap: candidate windows must be >= 2, got $candidates")
    val buckets = wal
      .groupBy(col("event_type"), expr("ts_ms div 3600000").as("hour"))
      .agg(sum(expr("cast(floor(value * 1000 + 0.5) as bigint)")).as("x"))
    val bounds = buckets.groupBy(col("event_type"))
      .agg(min(col("hour")).as("minh"), max(col("hour")).as("maxh"))
    // densify: the moving frame is W consecutive HOURS, not W present
    // rows — a gap would silently widen the physical window
    val dense = bounds
      .select(col("event_type"), col("minh"),
        explode(expr("sequence(minh, maxh)")).as("hour"))
      .join(buckets, Seq("event_type", "hour"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    // ALL candidate windows ride ONE window pass: same partition/order
    // spec with different frames computes in a single WindowExec (one
    // shuffle, one sorted sweep), then the per-candidate rows unfold
    // via explode. The old per-candidate-branch union re-derived the
    // densified series 7× per consumer and its 7-way-union plan paid
    // more in driver analysis than the data cost (profiled: 2.4 s wall,
    // 1.1 s of job time, every stage single-task). Rows are identical:
    // (event_type, w, hour, s) with the same full-frames filter.
    val sums = candidates.foldLeft(dense) { (df, wdw) =>
      df.withColumn(s"__s_$wdw", sum(col("x")).over(
        wOrd.rowsBetween(-(wdw - 1), Window.currentRow)))
    }
    val swept = sums
      .select(col("event_type"), col("minh"), col("hour"), col("x"),
        explode(array(candidates.map(wdw =>
          struct(lit(wdw).as("w"), col(s"__s_$wdw").as("s"))): _*)).as("ws"))
      .select(col("event_type"), col("minh"), col("hour"), col("x"),
        col("ws.w").as("w"), col("ws.s").as("s"))
      .filter(col("hour") >= col("minh") + col("w") - 1) // full frames only
    val wWin = Window.partitionBy(col("event_type"), col("w")).orderBy(col("hour"))
    val diffed = swept
      .withColumn("dd", col("s") - lag(col("s"), 1).over(wWin))
    val rough = diffed
      .filter(col("hour") >= col("minh") + col("w")) // both frames full
      .groupBy(col("event_type"), col("w"))
      .agg(sum(expr("cast(dd as decimal(18,0)) * cast(dd as decimal(18,0))"))
        .as("rough"))
    val winner = rough
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("rough"), col("w"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("w"))
    swept.join(broadcast(winner), Seq("event_type", "w"))
      .select(col("event_type"), col("w").as("window_w"),
        col("hour"), col("s").as("smoothed_milli"))
  }

  /** M4 downsample (Jugel et al., "M4: A Visualization-Oriented Time
    * Series Data Aggregation", VLDB 2014 — the min/max downsampling the
    * toolkit ships beside `lttb`): per (type, rank-bucket), the FIRST,
    * LAST, MIN and MAX points — the four rows that make a line render
    * pixel-identical to the full series. Buckets are equal-COUNT on the
    * (ts, lsn) total order, the same `(rn−1)·n_buckets div n` convention
    * as [[lttbDownsample]]; value ties pick the earliest point.
    * One window pass for ranks + one partial agg — no per-bucket state
    * beyond four (value, ord) champions, mergeable by construction.
    */
  def m4Downsample(wal: DataFrame, nBuckets: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 1, s"m4: nBuckets=$nBuckets must be >= 1")
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_ms"), col("lsn"))
    val wAll = Window.partitionBy(col("event_type"))
    val pts = wal
      .select(col("event_type"), col("ts_ms"), col("lsn"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("v"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("bucket", expr(s"((__rn - 1) * $nBuckets) div __n"))
    val ord = struct(col("ts_ms"), col("lsn"))
    pts.groupBy(col("event_type"), col("bucket"))
      .agg(
        min_by(struct(col("ts_ms"), col("v")), ord).as("__first"),
        max_by(struct(col("ts_ms"), col("v")), ord).as("__last"),
        min_by(struct(col("v"), col("ts_ms"), col("lsn")),
          struct(col("v"), col("ts_ms"), col("lsn"))).as("__min"),
        max_by(struct(col("v"), col("ts_ms"), col("lsn")),
          struct(col("v"), -col("ts_ms"), -col("lsn"))).as("__max"),
        count(lit(1)).as("n_pts"))
      .select(col("event_type"), col("bucket"), col("n_pts"),
        col("__first.ts_ms").as("first_ts"), col("__first.v").as("first_v"),
        col("__last.ts_ms").as("last_ts"), col("__last.v").as("last_v"),
        col("__min.ts_ms").as("min_ts"), col("__min.v").as("min_v"),
        col("__max.ts_ms").as("max_ts"), col("__max.v").as("max_v"))
  }

  /** `stats_agg` 2-D accessor family beyond slope/intercept (TimescaleDB
    * toolkit: `covariance`, `corr`, `determination_coefficient`,
    * `x_intercept`) — all derived from the SAME exact integer
    * accumulator [[statsAgg]] emits, in fixed-operation-order doubles
    * (division and sqrt are IEEE correctly-rounded, so both engines land
    * on identical bits from identical integer sums), then floor-scaled
    * to integers:
    *  - `covar_xy` — population covariance `(Σxy − Σx·Σy/n)/n` in raw
    *    minute·milli units (already integer-magnitude; no extra scale),
    *  - `corr_micro` — Pearson r × 10⁶; NULL when either side is
    *    constant (zero variance — the toolkit's NULL contract),
    *  - `determination_micro` — r² × 10⁶ from the same double r,
    *  - `x_intercept_milli` — `−intercept/slope` in milli-minutes; NULL
    *    when the fitted slope rounds to zero.
    * Zero extra shuffles: accessor arithmetic rides the statsAgg rows.
    */
  def stats2dAccessors(wal: DataFrame): DataFrame =
    statsAgg(wal)
      .withColumn("covar_xy", expr(
        """CASE WHEN n = 0 THEN NULL
          |     ELSE CAST(FLOOR(
          |       (CAST(sum_xy AS DOUBLE)
          |          - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE)
          |            / CAST(n AS DOUBLE))
          |       / CAST(n AS DOUBLE) + 0.5) AS BIGINT) END""".stripMargin))
      .withColumn("__corr_d", expr(
        """CASE WHEN CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
          |          - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) <= 0.0
          |          OR CAST(n AS DOUBLE) * CAST(sum_y2 AS DOUBLE)
          |          - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE) <= 0.0
          |     THEN NULL
          |     ELSE (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
          |             - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
          |          / (SQRT(CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
          |                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
          |             * SQRT(CAST(n AS DOUBLE) * CAST(sum_y2 AS DOUBLE)
          |                    - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
          |END""".stripMargin))
      .withColumn("corr_micro",
        expr("CAST(FLOOR(__corr_d * 1000000.0 + 0.5) AS BIGINT)"))
      .withColumn("determination_micro",
        expr("CAST(FLOOR(__corr_d * __corr_d * 1000000.0 + 0.5) AS BIGINT)"))
      .withColumn("x_intercept_milli", expr(
        // intercept and slope numerators share the y-MILLI unit, so the
        // ratio is already minutes — only the ×1000 to milli-minutes
        """CASE WHEN slope_micro = 0 THEN NULL
          |     ELSE CAST(FLOOR(-CAST(intercept_milli AS DOUBLE)
          |                     / (CAST(slope_micro AS DOUBLE) / 1000000.0)
          |                     * 1000.0 + 0.5) AS BIGINT) END""".stripMargin))
      .drop("__corr_d")

  /** `stats_agg` 1-D higher-moment accessors (TimescaleDB toolkit:
    * `skewness`, `kurtosis`) per (type, day bucket): the accumulator is
    * the exact integer power-sum vector (n, Σy, Σy², Σy³, Σy⁴) —
    * mergeable by addition, the rollup() contract — at DECI value scale,
    * chosen so Σy⁴ stays inside i64 at per-day group sizes (y ≤ ~10⁴ ⇒
    * y⁴ ≤ 10¹⁶·rows; document decimal(38,0) sums before rolling these
    * up to whole-corpus groups at larger scales). Population skewness
    * `m₃/m₂^{3/2}` and EXCESS kurtosis `m₄/m₂² − 3` come from the raw
    * sums via the standard central-moment expansion in fixed-order
    * doubles (sqrt only — `pow` is not correctly rounded, `m₂·√m₂` is),
    * ×10⁶ floored. NULL on degenerate buckets (n < 2 or zero variance;
    * m₂ can round to a denormal negative on constant series — the ≤ 0
    * guard fires identically in both engines because the bits match).
    * One partial-agg shuffle on (type, day).
    */
  def statsMoments(wal: DataFrame): DataFrame =
    wal
      .select(col("event_type"), col("chunk_day"),
        expr("cast(floor(value * 10 + 0.5) as bigint)").as("y"))
      .groupBy(col("event_type"), col("chunk_day"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("sum_y"),
        sum(col("y") * col("y")).as("sum_y2"),
        sum(col("y") * col("y") * col("y")).as("sum_y3"),
        sum(col("y") * col("y") * col("y") * col("y")).as("sum_y4"),
        max(abs(col("y"))).as("__absy"))
      // fail-loudly guard on the i64 envelope: Spark's non-ANSI sums
      // WRAP silently where the DuckDB twin's HUGEINT→BIGINT cast
      // throws — without this, Spark alone would ship garbage moments.
      // n·max|y|⁴ ≥ Σy⁴ is a conservative overestimate, so the guard
      // can only fire early, never miss a real wrap.
      .withColumn("sum_y4", expr(
        """CASE WHEN CAST(n AS DOUBLE) * POWER(CAST(greatest(__absy, 1L) AS DOUBLE), 4.0) < 9.0e18
          |  THEN sum_y4
          |  ELSE CAST(assert_true(false,
          |    'statsMoments: sum_y4 would overflow i64 — shrink the value scale or bucket finer') AS BIGINT)
          |END""".stripMargin))
      .drop("__absy")
      .withColumn("__mu", expr("CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("__m2", expr(
        "CAST(sum_y2 AS DOUBLE) / CAST(n AS DOUBLE) - __mu * __mu"))
      .withColumn("__m3", expr(
        """CAST(sum_y3 AS DOUBLE) / CAST(n AS DOUBLE)
          | - 3.0 * __mu * (CAST(sum_y2 AS DOUBLE) / CAST(n AS DOUBLE))
          | + 2.0 * __mu * __mu * __mu""".stripMargin))
      .withColumn("__m4", expr(
        """CAST(sum_y4 AS DOUBLE) / CAST(n AS DOUBLE)
          | - 4.0 * __mu * (CAST(sum_y3 AS DOUBLE) / CAST(n AS DOUBLE))
          | + 6.0 * __mu * __mu * (CAST(sum_y2 AS DOUBLE) / CAST(n AS DOUBLE))
          | - 3.0 * __mu * __mu * __mu * __mu""".stripMargin))
      .withColumn("skew_micro", expr(
        """CASE WHEN n >= 2 AND __m2 > 0.0
          |  THEN CAST(FLOOR(__m3 / (__m2 * SQRT(__m2)) * 1000000.0 + 0.5) AS BIGINT)
          |END""".stripMargin))
      .withColumn("kurtosis_micro", expr(
        """CASE WHEN n >= 2 AND __m2 > 0.0
          |  THEN CAST(FLOOR((__m4 / (__m2 * __m2) - 3.0) * 1000000.0 + 0.5) AS BIGINT)
          |END""".stripMargin))
      .drop("__mu", "__m2", "__m3", "__m4")

  /** `max_n` / `min_n` / `max_n_by` analog (TimescaleDB toolkit): the N
    * largest and N smallest values per type, each carrying its `by`
    * payload (here user_id + lsn — what `max_n_by` attaches). Ranked by
    * a `row_number` over (value, lsn) — deterministic ties — and
    * filtered to `rnk ≤ n`, which Spark's WindowGroupLimit rewrites to a
    * per-partition top-k BEFORE the shuffle: the exchange moves n rows
    * per partition per type, never the corpus (the toolkit's bounded
    * n-element state, expressed as a plan optimization). Both sides come
    * from one scan; the union is plan-level only.
    */
  def maxN(wal: DataFrame, n: Int = 5): DataFrame = {
    require(n > 0, s"maxN: n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    // NULL values are excluded BEFORE ranking: Spark sorts NULLs first
    // on ASC while DuckDB defaults to NULLS LAST, so an unfiltered NULL
    // would both occupy min_n ranks and diverge across engines.
    val base = wal.filter(col("value").isNotNull)
      .select(col("event_type"), col("user_id"), col("lsn"),
        expr("cast(floor(value * 1000 + 0.5) as bigint)").as("v_milli"))
    val wMax = Window.partitionBy(col("event_type"))
      .orderBy(col("v_milli").desc, col("lsn"))
    val wMin = Window.partitionBy(col("event_type"))
      .orderBy(col("v_milli").asc, col("lsn"))
    val maxSide = base.withColumn("rnk", row_number().over(wMax))
      .filter(col("rnk") <= n).withColumn("side", lit("max_n"))
    val minSide = base.withColumn("rnk", row_number().over(wMin))
      .filter(col("rnk") <= n).withColumn("side", lit("min_n"))
    maxSide.unionByName(minSide)
      .select(col("side"), col("event_type"), col("rnk").cast("long").as("rnk"),
        col("v_milli"), col("lsn"), col("user_id"))
  }

  /** `approx_percentile_rank` analog (TimescaleDB toolkit accessor, the
    * inverse of [[hdrQuantiles]]): for each probe value, the fraction of
    * the distribution at or below it, read off the SAME power-of-two
    * HDR bucket table — cumulative count of whole buckets below the
    * probe's bucket plus linear integer interpolation inside it,
    * `(shifted − 2^b + 1)·cnt div 2^b`. Probes are config literals, so
    * their bucket index and width are computed at PLAN TIME in Scala
    * (no bit tricks in SQL); ranks come out in ppm by integer division.
    * Same scale shape as hdrQuantiles: one partial agg to ≤64 rows per
    * type, then probe-conditional sums over that bounded table.
    */
  def hdrPercentileRank(wal: DataFrame, probesCents: Seq[Long],
                        groupCol: String = "event_type"): DataFrame = {
    require(probesCents.nonEmpty && probesCents.forall(_ + 1 > 0),
      s"hdrPercentileRank: probes must be > -1 cents, got $probesCents")
    val buckets = wal
      .select(col(groupCol),
        expr("""CASE WHEN value IS NOT NULL AND floor(value * 100 + 0.5) + 1 > 0
               |  THEN cast(floor(value * 100 + 0.5) as bigint) + 1
               |  ELSE cast(assert_true(false,
               |    'hdrPercentileRank: value must be non-null and > -0.005') as bigint)
               |END""".stripMargin).as("shifted"))
      .groupBy(col(groupCol),
        (length(conv(col("shifted"), 10, 2)) - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probes = probesCents.map { p =>
      val shifted = p + 1
      val pb = 63 - java.lang.Long.numberOfLeadingZeros(shifted)
      struct(lit(p).as("probe_cents"), lit(shifted).as("shifted"),
        lit(pb).as("pb"), lit(1L << pb).as("pw"))
    }
    buckets
      .withColumn("__p", explode(array(probes: _*)))
      .groupBy(col(groupCol), col("__p.probe_cents").as("probe_cents"))
      .agg(
        sum(when(col("bucket") < col("__p.pb"), col("cnt"))
          .when(col("bucket") === col("__p.pb"),
            expr("((__p.shifted - __p.pw + 1) * cnt) div __p.pw"))
          .otherwise(0L)).as("contrib"),
        sum(col("cnt")).as("n"))
      .select(col(groupCol), col("probe_cents"), col("n"),
        expr("(contrib * 1000000) div n").as("rank_ppm"))
  }
}
