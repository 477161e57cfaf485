package graft.cdc.source

import graft.cdc.ChunkSplitter.ChunkRange
import graft.cdc.{ChangeRecord, ChunkSplitter, FileCdcDatabase}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/**
 * DataSource-V2 CDC source over the file dialect — the Spark re-expression of
 * the reference's generalized incremental-snapshot framework
 * (flink-cdc-base/.../source/IncrementalSource.java:67-213, SURVEY §2.1 S11):
 *
 *   driver   = enumerator/assigner (chunk planning, offset bookkeeping —
 *              what MySqlSourceEnumerator/MySqlHybridSplitAssigner do via RPC
 *              is plain method calls + offset-log JSON here)
 *   executor = chunk read task with low/high-watermark backfill merge (W1/W2)
 *              and stream read task with per-chunk shouldEmit filter (W3)
 *
 * Startup modes mirror StartupOptions.java:39-90: initial (snapshot + log),
 * earliest (log from 0), latest (log from current).
 *
 * Scale design: each snapshot chunk is one InputPartition (default 8096 rows,
 * MySqlSourceOptions.java:104-109) so a 100 TB table fans out to bounded-
 * memory chunk tasks across the cluster; the log phase is a single ordered
 * partition per micro-batch, as in the reference (mysql-cdc.md:495).
 */
object CdcSourceConfig {
  val PathKey = "path"
  val TableKey = "table"
  val StartupModeKey = "scan.startup.mode" // initial | earliest | latest
  val ChunkSizeKey = "scan.incremental.snapshot.chunk.size"
  val ChangelogModeKey = "changelog.mode" // all | upsert

  def fromOptions(o: CaseInsensitiveStringMap): CdcSourceConfig = CdcSourceConfig(
    path = Option(o.get(PathKey)).getOrElse(
      throw new IllegalArgumentException("cdc source requires 'path'")),
    table = Option(o.get(TableKey)).getOrElse(
      throw new IllegalArgumentException("cdc source requires 'table'")),
    startupMode = o.getOrDefault(StartupModeKey, "initial"),
    chunkSize = o.getOrDefault(ChunkSizeKey,
      ChunkSplitter.DefaultChunkSize.toString).toInt,
    changelogMode = o.getOrDefault(ChangelogModeKey, "all"))
}

case class CdcSourceConfig(
    path: String,
    table: String,
    startupMode: String,
    chunkSize: Int,
    changelogMode: String) {
  require(Set("initial", "earliest", "latest").contains(startupMode),
    s"unknown $startupMode — expected initial|earliest|latest " +
      "(reference StartupOptions.java:39-90)")
  require(Set("all", "upsert").contains(changelogMode),
    "changelog.mode must be all|upsert (DebeziumChangelogMode.java:20-27)")

  def meta: FileCdcDatabase.TableMeta = FileCdcDatabase.readMeta(path, table)
}

class CdcTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val cfg = CdcSourceConfig.fromOptions(options)
    CdcTable.fullSchema(cfg.meta.schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcTable(CdcSourceConfig.fromOptions(
      new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = false
}

object CdcTable {
  /** Source schema = payload columns + always-present metadata columns
    * (reference exposes these via SupportsReadingMetadata,
    * MySqlReadableMetadata.java:33-86; with Spark, Catalyst column pruning
    * drops unused ones for free — SURVEY §2.5 P3). */
  def fullSchema(payload: StructType): StructType = StructType(
    payload.fields ++ Seq(
      StructField(ChangeRecord.OpCol, StringType, nullable = false),
      StructField(ChangeRecord.OffsetCol, LongType, nullable = false),
      StructField(ChangeRecord.TsCol, LongType, nullable = false),
      StructField(ChangeRecord.DbCol, StringType, nullable = false),
      StructField(ChangeRecord.TableCol, StringType, nullable = false)))
}

class CdcTable(cfg: CdcSourceConfig, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-cdc:${cfg.path}/${cfg.table}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(cfg, tableSchema)
}

class CdcScanBuilder(cfg: CdcSourceConfig, schema: StructType)
    extends ScanBuilder {
  override def build(): Scan = new CdcScan(cfg, schema)
}

class CdcScan(cfg: CdcSourceConfig, schema: StructType) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"CdcScan(${cfg.table}, ${cfg.startupMode})"
  override def toBatch: Batch = new CdcBatch(cfg)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(cfg)
}

/** Driver-side chunk planning shared by batch and stream paths — the
  * assigner role (MySqlHybridSplitAssigner.java:97-126). */
object CdcPlanner {
  def chunks(cfg: CdcSourceConfig): Seq[ChunkRange] = {
    val m = cfg.meta
    ChunkSplitter.split(m.minPk, m.maxPk, m.rowCount, cfg.chunkSize,
      // uneven fallback walks the snapshot's sorted keys (file dialect);
      // a JDBC dialect pushes this as SELECT MAX(pk)… LIMIT chunkSize
      // (StatementUtils.java:99-130)
      () => {
        val codec = new JsonRowCodec(m.schema)
        val pkIdx = m.schema.fieldIndex(m.pk)
        val pkType = m.schema(pkIdx).dataType
        FileCdcDatabase.dataFiles(cfg.path, cfg.table, "snapshot")
          .iterator.flatMap(FileCdcDatabase.lines)
          .map(l => toLongKey(codec.decode(l).get(pkIdx, pkType)))
          .toSeq.sorted.iterator
      })
  }

  def toLongKey(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: Decimal => d.toLong
    case other => throw new UnsupportedOperationException(
      s"non-integral chunk key: $other (reference limits even split to " +
        "BIGINT/INT/DECIMAL, MySqlChunkSplitter.java:385-395)")
  }

  /** Partitions for a fully-specified read: snapshot chunks at a uniform
    * high watermark and/or one ordered log range. */
  def plan(cfg: CdcSourceConfig, withSnapshot: Boolean, snapshotHigh: Long,
      logFrom: Long, logTo: Long): Array[InputPartition] = {
    val m = cfg.meta
    val snap: Seq[InputPartition] =
      if (withSnapshot)
        chunks(cfg).map(c => SnapshotChunkPartition(cfg.path, cfg.table,
          c.id, c.lo, c.hi, snapshotHigh))
      else Seq.empty
    val log: Seq[InputPartition] =
      if (logTo > logFrom)
        // finished-chunk high watermarks drive the stream-phase shouldEmit
        // filter (BinlogSplitReader.shouldEmit, :222-273). With a static
        // file snapshot all chunks share one high == logFrom.
        Seq(LogRangePartition(cfg.path, cfg.table, logFrom, logTo,
          cfg.changelogMode))
      else Seq.empty
    (snap ++ log).toArray
  }
}

class CdcBatch(cfg: CdcSourceConfig) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val maxOff = cfg.meta.maxOffset
    cfg.startupMode match {
      // current state: chunks merged up to the current log end (W2)
      case "initial" => CdcPlanner.plan(cfg, withSnapshot = true,
        snapshotHigh = maxOff, logFrom = maxOff, logTo = maxOff)
      // full history replay, no snapshot phase
      case "earliest" => CdcPlanner.plan(cfg, withSnapshot = false,
        snapshotHigh = 0L, logFrom = 0L, logTo = maxOff)
      case "latest" => Array.empty
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory()
}

/** Streaming offset: assigner state as JSON (SURVEY §4 — the reference's
  * PendingSplitsState serialized into the offset log). */
case class CdcStreamOffset(snapshotDone: Boolean, logOffset: Long)
    extends Offset {
  override def json(): String =
    s"""{"snapshotDone":$snapshotDone,"logOffset":$logOffset}"""
}

object CdcStreamOffset {
  def fromJson(s: String): CdcStreamOffset = {
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
    CdcStreamOffset(n.get("snapshotDone").asBoolean(),
      n.get("logOffset").asLong())
  }
}

class CdcMicroBatchStream(cfg: CdcSourceConfig)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = cfg.startupMode match {
    case "initial" => CdcStreamOffset(snapshotDone = false, logOffset = -1L)
    case "earliest" => CdcStreamOffset(snapshotDone = true, logOffset = 0L)
    case "latest" => CdcStreamOffset(snapshotDone = true,
      logOffset = cfg.meta.maxOffset)
  }

  private def current(): CdcStreamOffset =
    CdcStreamOffset(snapshotDone = true, logOffset = cfg.meta.maxOffset)

  /** Trigger.AvailableNow support: pin the end offset once, drain to it. */
  @volatile private var availableTarget: CdcStreamOffset = _
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = current()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    if (availableTarget != null) availableTarget else current()
  override def reportLatestOffset(): Offset = current()

  /** Heartbeat semantics (T5) fall out of micro-batching: the offset
    * advances to the current log end even when no rows flow. */
  override def latestOffset(): Offset = current()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcStreamOffset]
    val e = end.asInstanceOf[CdcStreamOffset]
    if (!s.snapshotDone)
      // hybrid batch: snapshot chunks merged to the high watermark; log
      // events ≤ high are consumed by the merge, not re-emitted (W2/W3)
      CdcPlanner.plan(cfg, withSnapshot = true, snapshotHigh = e.logOffset,
        logFrom = e.logOffset, logTo = e.logOffset)
    else
      CdcPlanner.plan(cfg, withSnapshot = false, snapshotHigh = s.logOffset,
        logFrom = s.logOffset, logTo = e.logOffset)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory()

  override def deserializeOffset(json: String): Offset =
    CdcStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
