package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 micro-batch source with **LSN offsets** — the
  * Spark shape of the reference's replication channel
  * (`internal/replication/replicationchannel/replicationhandler.go:
  * 115-215`): a monotone LSN cursor is the streaming offset; restart
  * resumes from the last committed LSN (T1, `replicationcontext.go:
  * 251-281`); each micro-batch serves the next LSN window (the
  * transaction-window bound, `transactiontracker.go:458-482`).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.WalDataSource")
  *   .option("path", "/root/testdata/sf0.001")
  *   .option("batchSize", "300")
  *   .load()
  * }}}
  *
  * This implementation materializes the WAL stand-in (events parquet,
  * lsn = event_id) at stream construction — correct for the harness's
  * bounded testdata; a production pgoutput source keeps the same
  * offset/partition contract but holds a replication socket in each
  * `PartitionReader` instead.
  */
class WalDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WalDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WalTable(properties.get("path"),
      Option(properties.get("batchSize")).map(_.toInt).getOrElse(1000))
}

object WalDataSource {
  val schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("xid", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))
}

class WalTable(path: String, batchSize: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-wal($path)"
  override def schema(): StructType = WalDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new WalScan(path, batchSize)
}

class WalScan(path: String, batchSize: Int) extends Scan {
  override def readSchema(): StructType = WalDataSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WalMicroBatchStream(path, batchSize)
}

/** Offset = highest LSN served (exclusive), exactly the restart-LSN
  * semantics of `spi/statestorage/offset.go:28-36`. */
case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = s"""{"lsn":$lsn}"""
}

case class WalRow(lsn: Long, xid: Long, op: String, tsMs: Long,
                  eventId: Long, userId: Long, value: Double, props: String)

class WalMicroBatchStream(path: String, batchSize: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // WAL stand-in materialized once per stream (bounded testdata); a
  // production source replaces this with a replication-slot cursor.
  private lazy val rows: Array[WalRow] = {
    val spark = SparkSession.active
    graft.cdc.Cdc.walEvents(spark, path)
      .selectExpr("lsn", "xid", "op", "ts_ms", "event_id", "user_id", "value", "props")
      .orderBy("lsn")
      .collect()
      .map(r => WalRow(r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getString(7)))
  }

  override def initialOffset(): Offset = LsnOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  // admission control: each micro-batch admits at most batchSize LSNs —
  // the transaction-window bound as a ReadLimit
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[LsnOffset].lsn
    LsnOffset(math.min(lo + batchSize, rows.length.toLong))
  }
  override def reportLatestOffset(): Offset = LsnOffset(rows.length.toLong)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    LsnOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
  override def commit(end: Offset): Unit = () // checkpoint log is the store
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LsnOffset].lsn
    val hi = end.asInstanceOf[LsnOffset].lsn
    // serve the window in batchSize slices — per-slice partitions keep
    // per-key order within a partition (T6 relaxation)
    (lo until hi by batchSize).map { s =>
      WalInputPartition(rows.slice(s.toInt, math.min(s + batchSize, hi).toInt))
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rs = partition.asInstanceOf[WalInputPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = {
            val r = rs(i)
            InternalRow(r.lsn, r.xid, UTF8String.fromString(r.op), r.tsMs,
              r.eventId, r.userId, r.value, UTF8String.fromString(r.props))
          }
          override def close(): Unit = ()
        }
      }
    }
}

case class WalInputPartition(rows: Array[WalRow]) extends InputPartition
