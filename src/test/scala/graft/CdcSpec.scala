package graft

import graft.cdc.Cdc
import graft.model.Envelope
import org.apache.spark.sql.functions._

/** Behavioral parity with the reference E2E matrix (FIXTURES.md §5,
  * `/root/reference/tests/streamer_test.go`). */
class CdcSpec extends SparkSpec {

  lazy val wal = Cdc.walEvents(spark, sf001).cache()

  test("envelope op codes cover exactly the reference set") {
    val ops = wal.select("op").distinct().collect().map(_.getString(0)).toSet
    assert(ops.subsetOf(Envelope.Op.all.toSet))
    assert(ops.contains(Envelope.Op.Create) && ops.contains(Envelope.Op.Delete))
  }

  test("event count and lsn ordering preserved (streamer_test.go:83-90 analog)") {
    assert(wal.count() === 1000)
    val lsns = wal.orderBy("lsn").select("lsn").collect().map(_.getLong(0))
    assert(lsns.zip(lsns.tail).forall { case (a, b) => a < b }, "lsn strictly increasing")
  }

  test("chunk resolution attributes every event to the parent hypertable (J1)") {
    val resolved = Cdc.resolveHypertable(wal, Cdc.chunkCatalog(spark, sf001),
      Cdc.hypertableCatalog(spark))
    assert(resolved.count() === 1000, "no event lost or duplicated by catalog join")
    assert(resolved.select("ht_table").distinct().collect().map(_.getString(0)).toSeq === Seq("events"))
  }

  test("tombstones: deletes emit exactly one extra event with flag set (T7)") {
    val t = Cdc.withTombstones(wal)
    val deletes = wal.filter(col("op") === "d").count()
    assert(t.count() === 1000 + deletes)
    assert(t.filter(col("is_tombstone")).count() === deletes)
  }

  test("op gates suppress disabled ops entirely (P3)") {
    val gated = Cdc.opGate(Seq("c"))(wal)
    assert(gated.select("op").distinct().collect().map(_.getString(0)).toSeq === Seq("c"))
  }

  test("lsn skip drops everything below restart point (P6/T1)") {
    val resumed = Cdc.lsnSkip(500L)(wal)
    assert(resumed.agg(min("lsn")).head.getLong(0) === 500L)
    assert(resumed.count() === 500)
  }

  test("snapshot fence: no event lost, none duplicated across fence (T4)") {
    val fenced = Cdc.snapshotWithFence(wal, 500)
    assert(fenced.count() === 1000)
    assert(fenced.filter(col("snapshot")).agg(max("lsn")).head.getLong(0) === 500L)
    assert(fenced.filter(!col("snapshot")).agg(min("lsn")).head.getLong(0) === 501L)
    // snapshot rows are all op="r" like the reference's read events
    assert(fenced.filter(col("snapshot")).select("op").distinct().count() === 1)
  }

  test("op gate at source reaches the parquet scan as PushedFilters (P3)") {
    val gated = Cdc.opGateAtSource(Seq("c", "u"))(Tables.events(spark, sf001))
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(event_type"),
      s"event_type gate must push to the scan:\n$plan")
  }

  test("narrow projections prune the parquet read schema") {
    val df = Tables.lineitem(spark, sf01).select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"2-column projection must not read the full row:\n$readSchema")
  }

  test("snapshot modes map to fence semantics (T8, config.go SnapshotMode)") {
    assert(Cdc.withSnapshotMode(wal, "initial", 500).count() === 1000)
    val io = Cdc.withSnapshotMode(wal, "initial_only", 500)
    assert(io.count() === 501 && io.filter(!col("snapshot")).count() === 0) // lsn 0..500
    val nv = Cdc.withSnapshotMode(wal, "never", 500)
    assert(nv.count() === 1000 && nv.filter(col("snapshot")).count() === 0)
    intercept[IllegalArgumentException] { Cdc.withSnapshotMode(wal, "bogus", 0) }
  }

  test("decompression suppression drops inserts only inside marked txns (P7)") {
    val out = Cdc.decompressionSuppress(wal)
    val markedXids = wal.filter(col("op") === "d").select("xid").distinct()
    val suppressed = wal.join(markedXids, "xid").filter(col("op") === "c").count()
    assert(out.count() === 1000 - suppressed)
    // inserts in unmarked txns survive
    val unmarkedInserts = wal.join(markedXids, Seq("xid"), "left_anti")
      .filter(col("op") === "c").count()
    assert(out.filter(col("op") === "c").count() === unmarkedInserts)
  }

  test("keyset snapshot batch respects bounds, order, limit (S5)") {
    val batch = Cdc.snapshotBatch(wal, "event_id", 100, 600, 200)
      .select("event_id").collect().map(_.getLong(0))
    assert(batch.length === 200)
    assert(batch.head === 101 && batch.last === 300)
    assert(batch.sameElements(batch.sorted))
  }

  test("partitioned envelope write prunes on table and chunk day") {
    val out = java.nio.file.Files.createTempDirectory("graft-envout").toString
    Cdc.writeEnvelopePartitioned(Cdc.envelopePipeline(spark, sf001), out)
    val dirs = new java.io.File(s"$out/table_name=events").list()
    assert(dirs != null && dirs.count(_.startsWith("chunk_day=")) > 1,
      "one partition directory per chunk day")
    // partition-pruned read touches a single chunk dir
    val pruned = spark.read.parquet(out)
      .filter(col("table_name") === "events" && col("chunk_day") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters"), "pruning expressed at scan")
  }

  test("transaction boundaries: contiguous, no gaps (T2)") {
    val txns = Cdc.txnBoundaries(wal).orderBy("xid").collect()
    assert(txns.length === 100)
    txns.foreach { r =>
      assert(r.getAs[Long]("commit_lsn") - r.getAs[Long]("begin_lsn") + 1 === r.getAs[Long]("n_events"))
    }
  }

  test("applyUpsert: last-LSN wins, terminal delete removes, delete-then-create revives") {
    import spark.implicits._
    // key 1: create then update → update's value survives
    // key 2: create then delete → absent
    // key 3: delete then create (out-of-order arrival orders by lsn) → revived
    // key 4: message op only → never materializes
    val frame = Seq(
      (1L, 1L, "c", 10.0, 100L), (5L, 1L, "u", 11.0, 105L),
      (2L, 2L, "c", 20.0, 101L), (6L, 2L, "d", 20.0, 106L),
      (7L, 3L, "c", 30.0, 107L), (3L, 3L, "d", 30.0, 103L),
      (4L, 4L, "m", 40.0, 104L)
    ).toDF("lsn", "user_id", "op", "value", "ts_ms")
    val state = Cdc.applyUpsert(frame).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("last_lsn"), r.getAs[String]("last_op"), r.getAs[Double]("value"))))
      .toMap
    assert(state.keySet === Set(1L, 3L))
    assert(state(1L) === ((5L, "u", 11.0)))
    assert(state(3L) === ((7L, "c", 30.0)))
  }

  test("caggRefresh: base ⊎ delta merge is exact vs full recompute at any fence") {
    val full = Cdc.caggPartials(wal).collect()
      .map(r => r.getAs[Int]("chunk_day") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_micros")))).toMap
    for (fence <- Seq(0L, 250L, 999L, 2000L)) {
      val merged = Cdc.caggRefresh(
          Cdc.caggPartials(wal.filter(col("lsn") <= fence)),
          wal.filter(col("lsn") > fence)).collect()
        .map(r => r.getAs[Int]("chunk_day") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("sum_micros")))).toMap
      assert(merged === full, s"fence=$fence")
    }
  }

  test("scd2History: versions chain per key, one current unless deleted last") {
    val hist = Cdc.scd2History(wal).collect()
    val byKey = hist.groupBy(_.getAs[Long]("user_id"))
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from_lsn"))
      // half-open intervals never overlap: from < to, and froms increase
      sorted.foreach { v =>
        if (!v.isNullAt(v.fieldIndex("valid_to_lsn")))
          assert(v.getAs[Long]("valid_from_lsn") < v.getAs[Long]("valid_to_lsn"), s"key $k")
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) <= 1, s"key $k")
    }
    // current SCD2 version ≡ applyUpsert state, key for key
    val current = hist.filter(_.getAs[Boolean]("is_current"))
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("valid_from_lsn")).toMap
    val state = Cdc.applyUpsert(wal).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_lsn")).toMap
    assert(current === state,
      "open SCD2 versions must be exactly the upsert-materialized state")
  }

  test("compactChangelog: replay-equivalent at and above the fence, smaller below") {
    for (fence <- Seq(100L, 500L, 900L)) {
      val compacted = Cdc.compactChangelog(wal, lit(fence))
      // the compaction contract: state at ANY lsn >= fence is identical
      for (at <- Seq(fence, fence + 50, Long.MaxValue)) {
        val full = Cdc.stateAtLsn(wal, lit(at)).collect().map(_.toString).sorted
        val compact = Cdc.stateAtLsn(compacted, lit(at)).collect().map(_.toString).sorted
        assert(compact.sameElements(full), s"fence=$fence at=$at")
      }
      // and it ACTUALLY dropped history: sf0.001 has repeated keys
      // below every fence used, so strict inequality is assertable
      assert(compacted.count() < wal.count(),
        s"fence=$fence: compaction must drop shadowed events")
    }
  }

  test("stateAtLsn at the max fence equals the full upsert replay") {
    val full = Cdc.applyUpsert(wal).collect().map(_.toString).sorted
    val traveled = Cdc.stateAtLsn(wal, lit(Long.MaxValue)).collect().map(_.toString).sorted
    assert(traveled.sameElements(full))
    // and at fence 0 only lsn-0's key can exist
    assert(Cdc.stateAtLsn(wal, lit(0L)).count() <= 1)
  }

  test("chunkChecksums: partition-invariant, and a one-row tamper flips exactly " +
    "its chunk's digest") {
    val base = Cdc.chunkChecksums(wal).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    val shuffled = Cdc.chunkChecksums(wal.repartition(13)).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(base === shuffled, "XOR fold is order/partitioning-independent")
    // tamper with one row's value: same counts, exactly one digest differs
    val tampered = Cdc.chunkChecksums(
      wal.withColumn("value",
        when(col("lsn") === 500L, col("value") + 1.0).otherwise(col("value"))))
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(tampered.view.mapValues(_._1).toMap === base.view.mapValues(_._1).toMap,
      "row counts unchanged")
    val diff = base.keySet.filter(k => base(k)._2 != tampered(k)._2)
    assert(diff.size === 1, s"exactly one chunk digest must differ, got $diff")
  }

  test("outboxRoute: inserts only, aggregate-type topics, payload verbatim") {
    val routed = Cdc.outboxRoute(wal)
    val inserts = wal.filter(col("op") === "c")
    assert(routed.count() === inserts.count(), "updates/deletes dropped")
    val topics = routed.select("topic").distinct().collect().map(_.getString(0))
    assert(topics.forall(_.startsWith("outbox.event.")))
    assert(topics.contains("outbox.event.signup"))
    // payload verbatim: every routed value is the source props for its lsn
    val joined = routed.join(inserts.select(col("lsn"), col("props")), "lsn")
    assert(joined.filter(col("value") =!= col("props")).count() === 0)
  }

  test("heartbeats: intervals partition the stream, high watermark is the interval max") {
    val hb = Cdc.heartbeats(wal, intervalMs = 3600000L).collect()
      .map(r => r.getAs[Long]("beat_ms") ->
        (r.getAs[Long]("high_lsn"), r.getAs[Long]("n_events"))).toMap
    assert(hb.values.map(_._2).sum === wal.count(), "every event in exactly one beat")
    val expect = wal.groupBy(expr("ts_ms div 3600000 * 3600000").as("beat_ms"))
      .agg(max(col("lsn")).as("hi"), count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hb === expect)
  }

  test("caggWeeklyFromDaily equals a from-scratch weekly rollup") {
    val weeklyFromDaily = Cdc.caggWeeklyFromDaily(Cdc.caggPartials(wal))
      .collect().map(_.toString).sorted
    val scratch = wal.filter(col("op") === "c")
      .groupBy(expr("chunk_day div 7").as("chunk_week"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 1000000 + 0.5) as bigint)")).as("sum_micros"))
      .collect().map(_.toString).sorted
    assert(weeklyFromDaily.sameElements(scratch))
  }

  test("unwrapNewRecordState: drop mode removes deletes, rewrite soft-deletes") {
    val dropped = Cdc.unwrapNewRecordState(wal, "drop")
    assert(dropped.filter(col("__op") === "d").count() === 0)
    assert(!dropped.columns.contains("__deleted"))
    val rewritten = Cdc.unwrapNewRecordState(wal, "rewrite")
    val dels = rewritten.filter(col("__deleted") === "true")
    assert(dels.count() === wal.filter(col("op") === "d").count())
    // after = null on delete ⇒ state columns are null, key survives
    assert(dels.filter(col("value").isNotNull || col("props").isNotNull).count() === 0)
    assert(dels.filter(col("user_id").isNull).count() === 0)
    intercept[RuntimeException](Cdc.unwrapNewRecordState(wal, "bogus"))
  }

  test("lsnGaps: two-level segment audit equals the textbook global lead") {
    import spark.implicits._
    // segmentBits=2 ⇒ segments of 4 LSNs. Delivered stream plants:
    // an in-segment gap (1→3), a boundary-straddling gap (6→9), and a
    // multi-segment hole (11→25, segments 3..5 empty) that must
    // collapse into ONE gap
    val delivered = Seq(0L, 1L, 3L, 5L, 6L, 9L, 10L, 11L, 25L, 26L).toDF("lsn")
    val got = Cdc.lsnGaps(delivered, segmentBits = 2)
      .orderBy("gap_after_lsn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((1L, 3L, 1L), (3L, 5L, 1L), (6L, 9L, 2L), (11L, 25L, 13L)))
    // contiguous stream: no gaps at any segmentation
    assert(Cdc.lsnGaps((100L to 140L).toDF("lsn"), segmentBits = 3).count() === 0)
    intercept[IllegalArgumentException] { Cdc.lsnGaps(delivered, segmentBits = 0) }
  }

  test("incrementalSnapshotChunk: DBLog invariant — replaying chunk output " +
    "reproduces the state at the high watermark") {
    val (keyLo, keyHi, lsnLo, lsnHi) = (20L, 60L, 400L, 700L)
    val out = Cdc.incrementalSnapshotChunk(wal, keyLo, keyHi, lsnLo, lsnHi)
    // snapshot rows only for untouched keys, and never outside the chunk
    val snapRows = out.filter(col("op") === "r")
    assert(snapRows.filter(col("user_id") <= keyLo || col("user_id") > keyHi).count() === 0)
    val touched = out.filter(col("op") =!= "r")
      .filter(col("user_id") > keyLo && col("user_id") <= keyHi)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(snapRows.filter(col("user_id").isin(touched.toSeq: _*)).count() === 0,
      "a stream-touched key must not also emit a snapshot row")
    // the DBLog contract: last-writer-wins replay of the output,
    // restricted to the chunk, equals stateAtLsn(hi) on the chunk
    val replayed = Cdc.applyUpsert(out)
      .filter(col("user_id") > keyLo && col("user_id") <= keyHi)
      .select("user_id", "value").collect().map(_.toString).sorted
    val expected = Cdc.stateAtLsn(wal, lit(lsnHi))
      .filter(col("user_id") > keyLo && col("user_id") <= keyHi)
      .select("user_id", "value").collect().map(_.toString).sorted
    assert(replayed.sameElements(expected))
  }

  test("compression state machine: transitions, intra-txn chain, overwrite, partial (T3)") {
    import spark.implicits._
    // hand-built chunk-status UPDATE stream exercising every branch of
    // transactiontracker.go:249-273 —
    //   chunk 1: compress (xid 1) then decompress in a LATER txn (xid 2)
    //   chunk 2: compress 0→9 then decompress IN THE SAME txn (xid 3) —
    //            the intra-txn old-status chain; 9 sets the 0x08 bit
    //   chunks 3+4: two compressions in one txn (xid 4) — the single
    //            compressionUpdate field means the LAST one wins
    //   chunk 5: 0→4 compress (xid 5), then 4→12 (xid 6) — a ≠0→≠0
    //            status change is NOT an event
    val updates = Seq(
      (10L, 1L, 1, 1, 100L),
      (20L, 2L, 1, 0, 200L),
      (30L, 3L, 2, 9, 300L), (31L, 3L, 2, 0, 310L),
      (40L, 4L, 3, 1, 400L), (41L, 4L, 4, 1, 410L),
      (52L, 5L, 5, 4, 520L),
      (61L, 6L, 5, 12, 610L)
    ).toDF("lsn", "xid", "chunk_id", "new_status", "ts_ms")
    val got = Cdc.compressionFromStatus(updates)
      .select("lsn", "xid", "tsdb_op", "chunk_name", "partial")
      .orderBy(col("lsn"), col("tsdb_op"), col("chunk_name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq
    assert(got === Seq(
      (10L, 1L, "c", "_hyper_1_1_chunk", false),
      (20L, 2L, "d", "_hyper_1_1_chunk", false),
      (31L, 3L, "c", "_hyper_1_2_chunk", true),
      (31L, 3L, "d", "_hyper_1_2_chunk", false),
      (41L, 4L, "c", "_hyper_1_4_chunk", false),
      (52L, 5L, "c", "_hyper_1_5_chunk", false)))
  }

  test("compression detection model-checked against a tracker simulation (T3, randomized)") {
    // a faithful Scala port of transactiontracker.go:249-273 + commit
    // emission :148-186 — catalog updated at commit, per-txn cU/dU
    // fields with last-writer overwrite, the same-chunk intra-txn
    // old-status override — replayed over random interleaved
    // multi-chunk histories and compared set-wise with the relational
    // form. Output tuple: (commit_lsn, xid, kind, chunk).
    def simulate(updates: Seq[(Long, Long, Int, Int)]): Set[(Long, Long, String, Int)] = {
      val catalog = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
      val out = scala.collection.mutable.Set[(Long, Long, String, Int)]()
      updates.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (xid, txn0) =>
        val txn = txn0.sortBy(_._1)
        var cU: Option[(Long, Int, Int)] = None
        var dU: Option[(Long, Int, Int)] = None
        txn.foreach { case (lsn, _, chunk, status) =>
          var old = catalog(chunk)
          if (old == 0 && status != 0) cU = Some((lsn, chunk, status))
          else if (cU.exists(_._2 == chunk)) old = cU.get._3
          if (old != 0 && status == 0) dU = Some((lsn, chunk, status))
        }
        val commitLsn = txn.map(_._1).max
        cU.foreach(u => out += ((commitLsn, xid, "c", u._2)))
        dU.foreach(u => out += ((commitLsn, xid, "d", u._2)))
        txn.foreach { case (_, _, chunk, status) => catalog(chunk) = status }
      }
      out.toSet
    }
    import spark.implicits._
    (0 until 25).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nChunks = 2 + rnd.nextInt(3)
      // generate txns of 1-4 updates; statuses 0..9; skip the one
      // REFERENCE BLIND SPOT (documented in the pinned test below):
      // a decompress-then-recompress of the SAME chunk inside ONE txn,
      // where the reference's catalog-at-commit staleness misses the
      // second compression — unreachable under TimescaleDB's own
      // one-compression-operation-per-txn discipline
      // The generator emits TimescaleDB's actual write discipline: a
      // transaction COMPRESSES at most one chunk (compress_chunk() is a
      // single-chunk operation — one nonzero update, optionally chained
      // with its own zero), while any number of chunks may DECOMPRESS
      // (zero updates against committed statuses). Outside that class
      // the reference's commit-time-stale catalog plus its single
      // compressionUpdate slot produce artifacts (pinned in the
      // divergence test below): it misses an intra-txn recompression,
      // lets a status wiggle re-steal the per-txn c slot, and loses the
      // intra-txn chain of any chunk evicted from the slot.
      val raw = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Int)]()
      var lsn = 10L
      (0 until (3 + rnd.nextInt(5))).foreach { xid =>
        val compressChunk = rnd.nextInt(nChunks)
        var compressed = false
        val closed = scala.collection.mutable.Set[Int]() // zero emitted
        (0 until (1 + rnd.nextInt(4))).foreach { _ =>
          val chunk = rnd.nextInt(nChunks)
          if (!closed(chunk)) {
            val status =
              if (chunk == compressChunk && !compressed && rnd.nextBoolean())
                1 + rnd.nextInt(9)
              else 0
            if (status == 0) closed += chunk else compressed = true
            raw += ((lsn, xid.toLong, chunk, status))
            lsn += 10
          }
        }
      }
      val expected = simulate(raw.toSeq)
      val got = Cdc.compressionFromStatus(
          raw.toSeq.map { case (l, x, c, s) => (l, x, c, s, l) }
            .toDF("lsn", "xid", "chunk_id", "new_status", "ts_ms"))
        .select("lsn", "xid", "tsdb_op", "chunk_name")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3).stripPrefix("_hyper_1_").stripSuffix("_chunk").toInt))
        .toSet
      assert(got === expected, s"seed=$seed updates=${raw.toSeq}")
    }
  }

  test("T3 documented divergence: intra-txn decompress-then-recompress of one chunk") {
    // the reference checks the compression branch against the CATALOG
    // status, which only updates at commit — so within [5→0, 0→3] in one
    // txn it records the decompression but misses the re-compression
    // (transactiontracker.go:313 oldChunkStatus still reads 5). The
    // relational form reads the true previous update and emits BOTH,
    // which is the strictly-more-faithful-to-the-data behavior; the
    // sequence is unreachable under TimescaleDB's own compression-txn
    // discipline (decompression runs in its own transaction). Pinned so
    // the difference is a recorded decision, not an accident.
    import spark.implicits._
    val updates = Seq(
      (10L, 1L, 7, 5, 10L),            // txn 1: compress 0→5
      (20L, 2L, 7, 0, 20L), (30L, 2L, 7, 3, 30L) // txn 2: decompress, recompress
    ).toDF("lsn", "xid", "chunk_id", "new_status", "ts_ms")
    val got = Cdc.compressionFromStatus(updates)
      .select("lsn", "xid", "tsdb_op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((10L, 1L, "c"), (30L, 2L, "d"), (30L, 2L, "c")))
    // corner 2: repeated nonzero statuses for an uncommitted chunk —
    // the reference re-enters its compression branch on EVERY one
    // (catalog old still 0 mid-txn), so a later status wiggle of chunk
    // A would steal the per-txn c slot from chunk B; the relational
    // form treats only the FIRST 0→≠0 as the compression and ≠0→≠0 as
    // the status wiggle it is, so B keeps the slot
    import spark.implicits._
    val updates2 = Seq(
      (10L, 1L, 1, 9, 10L),  // chunk 1 compresses (0→9)
      (20L, 1L, 2, 3, 20L),  // chunk 2 compresses (0→3) — last real compression
      (30L, 1L, 1, 6, 30L)   // chunk 1 status wiggle (9→6), not a compression
    ).toDF("lsn", "xid", "chunk_id", "new_status", "ts_ms")
    val got2 = Cdc.compressionFromStatus(updates2)
      .select("tsdb_op", "chunk_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got2 === Set(("c", "_hyper_1_2_chunk")))
    // corner 3: slot eviction — when chunk 2's compression overwrites
    // chunk 1's in the single compressionUpdate field, the reference
    // can no longer see chunk 1's intra-txn decompression (catalog
    // still 0, override keyed to chunk 2); the relational form keeps
    // per-chunk history and reports it
    val updates3 = Seq(
      (10L, 1L, 1, 9, 10L),  // chunk 1 compresses
      (20L, 1L, 2, 3, 20L),  // chunk 2 compresses — evicts chunk 1's slot
      (30L, 1L, 1, 0, 30L)   // chunk 1 decompresses in the same txn
    ).toDF("lsn", "xid", "chunk_id", "new_status", "ts_ms")
    val got3 = Cdc.compressionFromStatus(updates3)
      .select("tsdb_op", "chunk_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got3 === Set(("c", "_hyper_1_2_chunk"), ("d", "_hyper_1_1_chunk")))
  }

  test("fixture status stream drives BOTH event kinds through the envelope surface (T3)") {
    val ev = Cdc.compressionEvents(wal)
    val kinds = ev.select("tsdb_op").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("c", "d"), s"expected both kinds, got $kinds")
    assert(ev.filter(col("partial")).count() > 0, "partial (0x08) chunks present")
    // envelope stage renders every event, both kinds, as op='$'
    val env = Cdc.compressionEnvelopes(wal)
    assert(env.count() === ev.count())
    assert(env.filter(col("envelope").contains("\"tsdb_op\":\"d\"")).count() ===
      ev.filter(col("tsdb_op") === "d").count())
  }

  test("marker flow: open → suppress re-inserts → close → d event (T3/P7, 2.12+)") {
    import spark.implicits._
    val mwal = Seq(
      // xid 1: bracketed txn — inserts at 11/12 are decompression re-inserts
      (10L, 1L, "m", 0, 100L), (11L, 1L, "c", 0, 110L),
      (12L, 1L, "c", 1, 120L), (13L, 1L, "m", 0, 130L),
      // xid 2: single message — not a bracket, insert survives
      (20L, 2L, "m", 0, 200L), (21L, 2L, "c", 0, 210L),
      // xid 3: insert BEFORE the bracket opens survives
      (30L, 3L, "c", 2, 300L), (31L, 3L, "m", 2, 310L), (32L, 3L, "m", 2, 320L),
      // xid 5 (5%3=2): an APPLICATION outbox txn — two app messages with
      // an insert between them; a count-based bracket heuristic would
      // silently drop lsn 51, the prefix gate must keep it
      (50L, 5L, "m", 3, 500L), (51L, 5L, "c", 3, 510L), (52L, 5L, "m", 3, 520L)
    ).toDF("lsn", "xid", "op", "chunk_day", "ts_ms")
    // the fixture prefixes: xid 1/3 carry the exact marker ids, xid 5
    // carries the application outbox prefix (transactiontracker.go:33-34)
    val prefixes = Cdc.withMessagePrefix(mwal).filter(col("op") === "m")
      .select("lsn", "msg_prefix").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(prefixes(10L) === Cdc.DecompressionMarkerStartId)
    assert(prefixes(13L) === Cdc.DecompressionMarkerEndId)
    assert(prefixes(31L) === Cdc.DecompressionMarkerStartId)
    assert(prefixes(32L) === Cdc.DecompressionMarkerEndId)
    assert(prefixes(50L) === "app.outbox" && prefixes(52L) === "app.outbox")
    assert(prefixes(20L) === "graft")
    val d = Cdc.markerDecompression(mwal)
      .select("lsn", "xid", "tsdb_op", "chunk_name", "n_suppressed")
      .orderBy("lsn", "chunk_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(d === Seq(
      (13L, 1L, "d", "_hyper_1_0_chunk", 1L),
      (13L, 1L, "d", "_hyper_1_1_chunk", 1L)))
    val kept = Cdc.markerSuppress(mwal).select("lsn").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 13L, 20L, 21L, 30L, 31L, 32L, 50L, 51L, 52L),
      "exactly the bracketed re-inserts are dropped; markers, outside rows, " +
        "and application-outbox inserts survive")
    // one-flow invariant: suppressed count equals what the d events report
    assert((mwal.count() - kept.size) ===
      Cdc.markerDecompression(mwal).agg(sum("n_suppressed")).head.getLong(0))
    // marker messages are consumed by the tracker — they never become
    // message events; application messages keep their real prefix
    val msgs = Cdc.logicalMessages(mwal.withColumn("props", lit("{}")))
      .select("lsn", "prefix").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(msgs.keySet === Set(20L, 50L, 52L),
      "marker rows are swallowed before message-event generation")
    assert(msgs(50L) === "app.outbox")
  }

  test("marker flag is the reference's boolean: multi-bracket txns, idempotent start, stray end (T3/P7)") {
    import spark.implicits._
    val S = Cdc.DecompressionMarkerStartId
    val E = Cdc.DecompressionMarkerEndId
    // hand-prefixed WAL (shapes the fixture derivation cannot produce):
    // transactiontracker.go:383-392 keeps a BOOLEAN flag, not a nesting
    // counter — start sets it (idempotently), end clears it
    val prefixed = Seq(
      (10L, 1L, "m", 0, 100L, Some(S)),
      (11L, 1L, "c", 0, 110L, None), // suppressed — bracket 1
      (12L, 1L, "m", 0, 120L, Some(E)),
      (13L, 1L, "c", 0, 130L, None), // BETWEEN brackets — survives
      (14L, 1L, "m", 0, 140L, Some(S)),
      (15L, 1L, "m", 0, 150L, Some(S)), // repeated start: idempotent
      (16L, 1L, "c", 1, 160L, None), // suppressed — bracket 2
      (17L, 1L, "c", 1, 170L, None), // suppressed — bracket 2
      (18L, 1L, "m", 0, 180L, Some(E)), // FIRST end closes (boolean, not depth 2)
      (19L, 1L, "c", 2, 190L, None), // after close — survives
      // xid 2: stray end with no open bracket = a plain message
      (20L, 2L, "m", 0, 200L, Some(E)),
      (21L, 2L, "c", 0, 210L, None),
      // xid 3: trailing unclosed start — suppresses to txn end, NO event
      (30L, 3L, "m", 0, 300L, Some(S)),
      (31L, 3L, "c", 3, 310L, None)
    ).toDF("lsn", "xid", "op", "chunk_day", "ts_ms", "msg_prefix")
    val chunks = Seq(0, 1, 2, 3).toDF("chunk_day")
      .withColumn("chunk_name",
        concat(lit("_hyper_1_"), col("chunk_day"), lit("_chunk")))
    val kept = Cdc.markerSuppressPrefixed(prefixed)
      .select("lsn").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 12L, 13L, 14L, 15L, 18L, 19L, 20L, 21L, 30L),
      "between-bracket and post-close inserts survive; bracketed and " +
        "unclosed-trailing inserts are dropped; stray-end txn untouched")
    val d = Cdc.markerDecompressionPrefixed(prefixed, chunks)
      .select("lsn", "xid", "chunk_name", "n_suppressed", "ts_ms")
      .orderBy("lsn", "chunk_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(d === Seq(
      (12L, 1L, "_hyper_1_0_chunk", 1L, 110L),
      (18L, 1L, "_hyper_1_1_chunk", 2L, 170L)),
      "one event per (bracket, chunk) at its closing marker; the " +
        "unclosed bracket emits nothing")
  }

  test("chunk DELETE of a compress_ row emits 'd'; retention drops stay silent (T3 marker mode)") {
    val deletes = Cdc.chunkDeleteEvents(wal)
    val d = Cdc.chunkDeleteDecompression(deletes, Cdc.hypertableCatalogCompression(spark))
    assert(d.count() > 0, "decompressed chunks exist in the fixture")
    // only compress_ twins emit; the plain-chunk retention drops don't
    assert(d.filter(!col("chunk_name").startsWith("compress_hyper_2_")).count() === 0)
    assert(deletes.filter(col("chunk_name").startsWith("_hyper_1_")).count() > 0,
      "the fixture must contain the negative case (plain-chunk deletes)")
    // every event resolves through hypertable 2 back to the user table
    val keys = d.select("key_schema", "key_table").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys === Seq(("public", "events")))
  }

  test("status catalog: compressed chunks backlink and resolve to the user hypertable (J2)") {
    val cat = Cdc.chunkCatalogStatus(spark, sf001)
    val res = Cdc.resolveUncompressed(Cdc.hypertableCatalogCompression(spark))
    val compressedData = cat.filter(col("hypertable_id") === 1 && col("status") =!= 0)
    val cside = cat.filter(col("hypertable_id") === 2)
    assert(compressedData.count() === cside.count(),
      "every compressed data chunk has exactly one compress_ twin")
    assert(cside.filter(!col("chunk_name").startsWith("compress_hyper_2_")).count() === 0)
    // backlink ids line up pairwise
    assert(compressedData.join(cside.select(col("chunk_id").as("compressed_chunk_id")),
      Seq("compressed_chunk_id")).count() === compressedData.count())
    // ResolveUncompressedHypertable: id 2 → (public, events); id 1 → itself
    val m = res.collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m(1) === ("public", "events") && m(2) === ("public", "events"))
    // partial column reads the 0x08 bit of the final status
    assert(cat.filter(col("partial") =!= (col("status").bitwiseAND(lit(8)) === 8)).count() === 0)
  }
}
