package graft

import graft.functions.FnvHash64
import graft.streaming.TxnAssembler
import org.apache.spark.sql.functions._

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("FNV-64a matches published test vectors (snapshotter.go:88 parity)") {
    // public FNV-1a 64-bit vectors
    assert(FnvHash64.hash("".getBytes("UTF-8")) === 0xcbf29ce484222325L)
    assert(FnvHash64.hash("a".getBytes("UTF-8")) === 0xaf63dc4c8601ec8cL)
    assert(FnvHash64.hash("foobar".getBytes("UTF-8")) === 0x85944171f73967e8L)
    // expression path equals scala path
    val viaExpr = Seq("public.events").toDF("t")
      .select(FnvHash64.fnv_hash64(col("t"))).head.getLong(0)
    assert(viaExpr === FnvHash64.hash("public.events".getBytes("UTF-8")))
  }

  test("snapshot partition assignment is unsigned-mod (Go uint64 % parity)") {
    // names chosen so several FNV hashes have the top bit set — where
    // signed pmod and uint64 % disagree for n=5
    val names = (1 to 64).map(i => s"public.events_$i")
    val parts = names.toDF("t")
      .select(col("t"), FnvHash64.snapshotPartition(col("t"), 5).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    names.foreach { n =>
      val want = java.lang.Long.remainderUnsigned(
        FnvHash64.hash(n.getBytes("UTF-8")), 5L)
      assert(parts(n) === want, s"for $n")
    }
    assert(names.exists(n => FnvHash64.hash(n.getBytes("UTF-8")) < 0),
      "test vector set must include negative (top-bit-set) hashes")
  }

  test("truncate events: one per (xid, table), no row images (op t)") {
    val wal = graft.cdc.Cdc.walEvents(spark, sf001)
    val t = graft.cdc.Cdc.truncateEvents(wal,
      graft.cdc.Cdc.chunkCatalog(spark, sf001), graft.cdc.Cdc.hypertableCatalog(spark))
    val rows = t.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("op") == "t"))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("before")) &&
      r.isNullAt(r.fieldIndex("after"))))
    // distinct-by-canonical-name within a message
    val keys = rows.map(r => (r.getAs[Long]("xid"),
      r.getAs[String]("schema_name"), r.getAs[String]("table_name")))
    assert(keys.distinct.length === keys.length)
  }

  test("replica identity validation (replicator.go:250-311)") {
    import graft.catalog.ReplicaIdentity._
    // the events table: PK on event_id, DEFAULT identity → valid
    assert(check(Seq(TableIdentity("public.events", Default, hasPrimaryKey = true))).isEmpty)
    // FULL always valid, caggs skipped
    assert(check(Seq(
      TableIdentity("public.nopk", Full, hasPrimaryKey = false),
      TableIdentity("public.cagg", Default, hasPrimaryKey = false,
        isContinuousAggregate = true))).isEmpty)
    // failing configs abort startup with the reference's wording
    val issues = check(Seq(
      TableIdentity("public.nopk", Default, hasPrimaryKey = false),
      TableIdentity("public.noidx", Index, hasPrimaryKey = true, hasReplicaIndex = false)))
    assert(issues.length === 2)
    assert(issues.head.contains("no valid primary key"))
    assert(issues(1).contains("no valid index"))
    intercept[IllegalStateException] {
      validate(Seq(TableIdentity("public.nopk", Default, hasPrimaryKey = false)))
    }
  }

  test("stateful txn assembly equals batch txn boundaries (T2)") {
    // ProcessingTimeTimeout keeps state timers pending, and pending
    // timers keep the trigger scheduling no-data batches INDEFINITELY
    // (observed: 3000+ empty batches; they also hold noNewData false,
    // so awaitTermination AND processAllAvailable both spin forever).
    // The deterministic harness: poll the sink for the expected row
    // count, then stop the query. Timeout/overflow semantics are
    // unit-tested below via TestGroupState, where the clock is ours.
    val want = graft.cdc.Cdc.txnBoundaries(graft.cdc.Cdc.walEvents(spark, sf001))
      .orderBy("xid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(want.nonEmpty)
    val q = TxnAssembler.txnStream(spark, sf001)
      .writeStream.format("memory").queryName("txns")
      .outputMode("append").start()
    try {
      def count(): Long = spark.sql("SELECT count(*) FROM txns").head.getLong(0)
      val deadline = System.nanoTime + 240e9.toLong
      while (count() < want.length && System.nanoTime < deadline) Thread.sleep(200)
    } finally q.stop()
    val got = spark.sql("SELECT xid, begin_lsn, commit_lsn, n_events, commit_ts_ms FROM txns ORDER BY xid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === want.length)
    assert(got.sameElements(want))
  }

  test("publication lifecycle: create/adopt/attach/detach/auto-drop (publicationmanager.go:35-110)") {
    import graft.catalog.PublicationManager
    // fresh publication: created on ensure
    val pm = new PublicationManager("graft_pub")
    assert(!pm.existsPublication)
    pm.ensurePublication()
    assert(pm.existsPublication)
    assert(!pm.createPublication(), "create on an existing publication reports not-new")
    // attach is idempotent and keyed by canonical name
    assert(pm.attachTables(Seq("public.events", "public.users", "public.events"))
      === Seq("public.events", "public.users"))
    assert(pm.attachTables(Seq("public.events")) === Seq.empty)
    assert(pm.existsTableInPublication("public.users"))
    assert(pm.readPublishedTables === Seq("public.events", "public.users"))
    // detach is idempotent; unknown tables are ignored
    assert(pm.detachTables(Seq("public.users", "public.missing")) === Seq("public.users"))
    assert(pm.readPublishedTables === Seq("public.events"))
    // auto-drop on close; operations after close fail loudly
    pm.close()
    intercept[IllegalStateException] { pm.readPublishedTables }

    // pre-existing publication: adopted as-is, never recreated
    val adopted = new PublicationManager("existing_pub", publicationCreate = false,
      preExisting = Some(Set("public.events")))
    adopted.ensurePublication()
    assert(adopted.readPublishedTables === Seq("public.events"))
    // missing + create disabled aborts startup (reference wording)
    val noCreate = new PublicationManager("missing_pub", publicationCreate = false)
    intercept[IllegalStateException] { noCreate.ensurePublication() }
    // DROP IF EXISTS semantics: dropping a missing publication is fine
    val dropper = new PublicationManager("droppable", publicationAutoDrop = false)
    dropper.dropPublication()
    dropper.createPublication()
    dropper.dropPublication()
    assert(!dropper.existsPublication)
    // attach on a dropped publication fails like ALTER on a missing one
    intercept[IllegalStateException] { dropper.attachTables(Seq("public.t")) }
  }

  test("replication slot lifecycle: create-or-adopt, drop-only-if-created, monotonic ack") {
    import graft.catalog.ReplicationSlotManager
    // fresh slot: created, snapshot exported
    val fresh = new ReplicationSlotManager("slot_a")
    val (name, snap, created) = fresh.createReplicationSlot()
    assert(name === "slot_a" && created && snap.nonEmpty)
    // monotonic ack: a late out-of-order ack never regresses the restart point
    fresh.acknowledgeProcessed(500L)
    fresh.acknowledgeProcessed(300L)
    assert(fresh.restartLsn === 500L)
    fresh.acknowledgeReceived(800L)
    assert(fresh.receivedLsn === 800L)
    assert(fresh.dropReplicationSlot(), "created + autodrop slot drops on close")
    intercept[IllegalStateException] { fresh.createReplicationSlot() }
    // adopted slot: no snapshot, never dropped (ownership stays external)
    val adopted = new ReplicationSlotManager("slot_b", preExisting = true)
    val (_, snapB, createdB) = adopted.createReplicationSlot()
    assert(!createdB && snapB.isEmpty)
    assert(!adopted.dropReplicationSlot(), "adopting never steals ownership")
    assert(adopted.existsSlot)
    // created but autodrop off: survives close
    val keep = new ReplicationSlotManager("slot_c", slotAutoDrop = false)
    keep.createReplicationSlot()
    assert(!keep.dropReplicationSlot())
    // create disabled + missing: loud startup failure
    val noCreate = new ReplicationSlotManager("slot_d", slotCreate = false)
    intercept[IllegalStateException] { noCreate.createReplicationSlot() }
    // ack before create: loud
    intercept[IllegalStateException] {
      new ReplicationSlotManager("slot_e").acknowledgeProcessed(1L)
    }
  }

  test("postgresql.publication/replicationslot/snapshot config keys wire through") {
    import graft.streaming.ConfigPipeline
    val props = Map(
      "postgresql.publication.name" -> "my_pub",
      "postgresql.publication.autodrop" -> "false",
      "postgresql.replicationslot.name" -> "my_slot",
      "postgresql.replicationslot.create" -> "false",
      "internal.snapshotter.parallelism" -> "7",
      "postgresql.snapshot.batchsize" -> "250")
    val pm = ConfigPipeline.publicationManager(props)
    assert(pm.publicationName === "my_pub" && !pm.publicationAutoDrop && pm.publicationCreate)
    val slot = ConfigPipeline.replicationSlotManager(props, preExisting = true)
    assert(slot.slotName === "my_slot" && !slot.slotCreate && slot.slotAutoDrop)
    assert(ConfigPipeline.snapshotterConfig(props) === ((7, 250)))
    // defaults: parallelism 5 / batchsize 1000 (snapshotter.go:88-89),
    // random 20-lowercase slot name (replicationcontext.go:73-75)
    assert(ConfigPipeline.snapshotterConfig(Map.empty) === ((5, 1000)))
    val defaulted = ConfigPipeline.replicationSlotManager(Map.empty)
    assert(defaulted.slotName.length === 20 && defaulted.slotName.forall(c => c >= 'a' && c <= 'z'))
    // illegal values fail with the key in the message
    intercept[IllegalArgumentException] {
      ConfigPipeline.snapshotterConfig(Map("postgresql.snapshot.batchsize" -> "0"))
    }
    intercept[IllegalArgumentException] {
      ConfigPipeline.publicationManager(Map("postgresql.publication.create" -> "yes"))
    }
  }

  test("postgresql.connection parses both pgx forms; postgresql.password overrides") {
    import graft.streaming.ConfigPipeline.jdbcConnection
    // keyword/value DSN
    assert(jdbcConnection(Map("postgresql.connection" ->
      "host=db1 port=5433 user=repl dbname=tsdb password=inline")) ===
      (("jdbc:postgresql://db1:5433/tsdb", "repl", "inline")))
    // postgres:// URL form
    assert(jdbcConnection(Map("postgresql.connection" ->
      "postgres://u:p@db2:5434/mydb")) ===
      (("jdbc:postgresql://db2:5434/mydb", "u", "p")))
    // postgresql.password overrides the embedded one (streamer.go:68-71)
    assert(jdbcConnection(Map(
      "postgresql.connection" -> "postgres://u:p@db2/mydb",
      "postgresql.password" -> "vaulted"))._3 === "vaulted")
    // defaults: reference default string, dbname falls back to user
    assert(jdbcConnection(Map.empty) ===
      (("jdbc:postgresql://localhost:5432/repl_user", "repl_user", "")))
    // libpq quoting: a password with spaces and escaped quotes survives
    assert(jdbcConnection(Map("postgresql.connection" ->
      """host=db3 user=u password='my \'secret\' pw' dbname=d"""))._3 ===
      "my 'secret' pw")
    // whitespace around '=' is legal libpq
    assert(jdbcConnection(Map("postgresql.connection" ->
      "host = db4 port = 5000 user = x"))._1 === "jdbc:postgresql://db4:5000/x")
    intercept[IllegalArgumentException] {
      jdbcConnection(Map("postgresql.connection" -> "host=db password='oops"))
    }
  }

  test("configuredSnapshot: slot + parallelism/batchsize drive the fenced keyset scan") {
    import graft.streaming.ConfigPipeline
    val url = graft.sources.JdbcSideChannel.derbyEventsUrl(spark, sf001)
    val props = Map(
      "postgresql.replicationslot.name" -> "snap_slot",
      "internal.snapshotter.parallelism" -> "4",
      "postgresql.snapshot.batchsize" -> "100")
    val (df, fence, slot) = ConfigPipeline.configuredSnapshot(
      spark, url, "APP", "EVENTS", "EVENT_ID", props)
    assert(slot.slotName === "snap_slot")
    assert(df.rdd.getNumPartitions === 4, "one partition per configured snapshotter")
    val n = Tables.events(spark, sf001).count()
    assert(df.count() === n, "fenced snapshot covers the whole table")
    assert(fence === Tables.events(spark, sf001).agg(max(col("event_id"))).head.getLong(0))
  }

  test("txn window bounds: overflow at maxSize evicts state (transactiontracker.go:458-482)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def st(prev: Option[TxnAssembler.TxnState], timedOut: Boolean = false) =
      TestGroupState.create[TxnAssembler.TxnState](
        Optional.ofNullable(prev.orNull), GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long](), timedOut)
    val step = TxnAssembler.assemble(10L, 60000L, withTimeout = true) _
    // under the bound: state kept, timeout armed
    val s1 = st(None)
    val out1 = step(7L, (1 to 4).iterator.map(i =>
      TxnAssembler.WalEv(100L + i, 7L, "c", 1000L + i)), s1).toSeq
    assert(out1.map(_.n_events) === Seq(4L))
    assert(s1.exists && s1.get.n === 4L)
    // crossing maxSize: summary still emitted, state REMOVED (stream-through)
    val s2 = st(Some(s1.get))
    val out2 = step(7L, (5 to 12).iterator.map(i =>
      TxnAssembler.WalEv(100L + i, 7L, "c", 1000L + i)), s2).toSeq
    assert(out2.map(_.n_events) === Seq(12L))
    assert(!s2.exists, "overflowed window must be evicted")
    // events after overflow start a fresh window
    val s3 = st(None)
    val out3 = step(7L, Iterator(TxnAssembler.WalEv(200L, 7L, "c", 2000L)), s3).toSeq
    assert(out3.map(_.n_events) === Seq(1L))
    assert(s3.exists && s3.get.n === 1L)
  }

  test("txn window bounds: processing-time timeout evicts idle state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val step = TxnAssembler.assemble(10000L, 60000L, withTimeout = true) _
    val s = TestGroupState.create[TxnAssembler.TxnState](
      Optional.of(TxnAssembler.TxnState(1L, 9L, 3L, 100L, 61000L)),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long](), true)
    val out = step(42L, Iterator.empty, s).toSeq
    assert(out.isEmpty, "timeout flush emits nothing new (summaries stream per batch)")
    assert(!s.exists, "timed-out window must be evicted")
    assert(s.isRemoved)
  }

  test("txn window deadline is fixed from window open, not a sliding idle timeout") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val step = TxnAssembler.assemble(10000L, 60000L, withTimeout = true) _
    def st(prev: Option[TxnAssembler.TxnState], nowMs: Long) =
      TestGroupState.create[TxnAssembler.TxnState](
        Optional.ofNullable(prev.orNull), GroupStateTimeout.ProcessingTimeTimeout,
        nowMs, Optional.empty[Long](), false)
    // window opens at t=1000 → deadline 61000 recorded in state
    val s1 = st(None, 1000L)
    step(9L, Iterator(TxnAssembler.WalEv(1L, 9L, "c", 10L)), s1).toSeq
    assert(s1.get.deadlineMs === 61000L)
    // trickling events keep arriving BEFORE the deadline: state persists,
    // the armed timeout shrinks to the REMAINING window (not re-armed full)
    val s2 = st(Some(s1.get), 50000L)
    step(9L, Iterator(TxnAssembler.WalEv(2L, 9L, "c", 20L)), s2).toSeq
    assert(s2.exists && s2.get.deadlineMs === 61000L)
    assert(s2.getTimeoutTimestampMs.get() === 61000L,
      "timeout must be armed at the fixed deadline, not now + full period")
    // an event arriving past the deadline streams through and evicts —
    // reference: deadline.Before(now) => timedOut => drain
    val s3 = st(Some(s2.get), 61500L)
    val out = step(9L, Iterator(TxnAssembler.WalEv(3L, 9L, "c", 30L)), s3).toSeq
    assert(out.map(_.n_events) === Seq(3L), "expired window still streams the summary")
    assert(!s3.exists, "expired window must be evicted")
  }

  test("envelope json carries before/after per op semantics") {
    val env = graft.cdc.Cdc.envelopeJson(spark, sf001)
    val rows = env.orderBy("lsn").limit(50).collect()
    rows.foreach { r =>
      val js = r.getString(1)
      assert(js.contains("\"payload\""))
      assert(js.contains("\"source\""))
    }
    // delete ops: no after block; create ops: after present
    val wal = graft.cdc.Cdc.walEvents(spark, sf001).select("lsn", "op").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (lsn, js) = (r.getLong(0), r.getString(1))
      wal(lsn) match {
        case "d" => assert(!js.contains("\"after\":{"), s"delete must have no after: $js")
        case "c" => assert(js.contains("\"after\":{"), s"create must carry after: $js")
        case _ =>
      }
    }
  }
}
