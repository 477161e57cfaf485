package graft.cdc.dialect

import graft.cdc.FileCdcDatabase
import graft.cdc.FileCdcDatabase.TableMeta

/**
 * Database-dialect boundary of the CDC source — the Spark re-expression of
 * the reference's `DataSourceDialect` SPI (flink-cdc-base/.../dialect/
 * DataSourceDialect.java:39-70: discoverDataCollections /
 * discoverDataCollectionSchemas / displayCurrentOffset / chunk splitter /
 * fetch tasks). One generic DSv2 source (graft.cdc.source) parameterized by
 * a dialect = the reference's one `IncrementalSource` parameterized the same
 * way (SURVEY §2.1 S11).
 *
 * Executor-side methods return raw record lines; the generic source owns
 * decoding (JsonRowCodec) and the watermark merge. Implementations must be
 * driver-constructible AND executor-resolvable by name (partitions carry
 * `(dialect, path, table)` strings, not object graphs).
 */
trait CdcDialect extends Serializable {

  def name: String

  /** Captured-table discovery (≈ discoverDataCollections). */
  def discoverTables(path: String): Seq[String]

  /** Schema + stats + log head of one table (≈ discoverDataCollectionSchemas
    * + displayCurrentOffset). */
  def tableMeta(path: String, table: String): TableMeta

  /** Snapshot rows possibly overlapping chunk range [lo, hi) — a dialect
    * pushes the range to the store (SQL WHERE / file pruning). */
  def snapshotLines(path: String, table: String,
      lo: Option[Long], hi: Option[Long]): Iterator[String]

  /** Log records with offsets in (from, to], offset-ordered. */
  def logLines(path: String, table: String, from: Long, to: Long): Iterator[String]

  /** Distinct event offsets in (from, to] across `tables` — drives rate
    * limiting; a JDBC dialect asks the database instead of scanning. */
  def offsetsBetween(path: String, tables: Seq[String],
      from: Long, to: Long): Seq[Long]

  /** Startup position for timestamp mode: first offset with source ts ≥
    * `tsMs`, minus 1; log head if none. */
  def offsetForTimestamp(path: String, tables: Seq[String], tsMs: Long): Long

  /** Precondition check at scan start — the reference validates server
    * config before reading (MySqlValidator.java:78-141 binlog_format=ROW,
    * SqlServerValidator CDC-enabled). Throw with an actionable message on
    * failure. */
  def validate(path: String, tables: Seq[String]): Unit = ()
}

/** Dialect registry: resolution by name on driver and executors. */
object CdcDialects {
  val all: Map[String, CdcDialect] = Map(
    FileCdcDialect.name -> FileCdcDialect)
  def byName(n: String): CdcDialect = all.getOrElse(n,
    throw new IllegalArgumentException(
      s"unknown cdc dialect '$n' (have: ${all.keys.mkString(",")})"))
}

/**
 * The file-backed dialect (zero-egress test instance, SURVEY §5): snapshot =
 * PK-range-partitioned sorted JSONL with per-file key stats, log = offset-
 * sorted JSONL envelope files. All I/O fast paths (file pruning, prefix
 * parses, early stops) live here — the generic source never assumes them.
 */
object FileCdcDialect extends CdcDialect {
  import graft.cdc.ChangeRecord

  val name = "file"

  override def discoverTables(path: String): Seq[String] =
    FileCdcDatabase.discoverTables(path)

  /** File-dialect preconditions: meta readable, PK integral (the chunk key
    * contract — MySqlChunkSplitter.java:385-395 limits splits the same way). */
  override def validate(path: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      val m = tableMeta(path, t)
      val pkType = m.schema(m.schema.fieldIndex(m.pk)).dataType
      require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(pkType) ||
        pkType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
        s"table $t: chunk key '${m.pk}' must be integral, got $pkType")
    }

  override def tableMeta(path: String, table: String): TableMeta =
    FileCdcDatabase.readMeta(path, table)

  override def snapshotLines(path: String, table: String,
      lo: Option[Long], hi: Option[Long]): Iterator[String] = {
    val meta = tableMeta(path, table)
    val all = FileCdcDatabase.dataFiles(path, table, "snapshot")
    val pruned =
      if (meta.snapshotFiles.isEmpty) all
      else {
        val byName = meta.snapshotFiles.map(f => f.file -> f).toMap
        all.filter { p =>
          byName.get(java.nio.file.Paths.get(p).getFileName.toString) match {
            case Some(fr) =>
              lo.forall(fr.maxPk >= _) && hi.forall(fr.minPk < _)
            case None => true
          }
        }
      }
    val sortedByPk = meta.snapshotFiles.nonEmpty
    pruned.iterator.flatMap { f =>
      val ls = FileCdcDatabase.lines(f)
      if (sortedByPk && hi.isDefined)
        ls.map(l => (FileCdcDatabase.quickLongField(l, meta.pk), l))
          .takeWhile(_._1 < hi.get)
          .map(_._2)
      else ls
    }
  }

  override def logLines(path: String, table: String,
      from: Long, to: Long): Iterator[String] =
    FileCdcDatabase.dataFiles(path, table, "log").iterator
      .flatMap { f =>
        FileCdcDatabase.lines(f)
          .map(l => (FileCdcDatabase.quickLongField(l, ChangeRecord.OffsetCol), l))
          .takeWhile(_._1 <= to)
          .collect { case (o, l) if o > from => l }
      }

  override def offsetsBetween(path: String, tables: Seq[String],
      from: Long, to: Long): Seq[Long] =
    tables.iterator
      .flatMap(t => FileCdcDatabase.dataFiles(path, t, "log"))
      .flatMap { f =>
        FileCdcDatabase.lines(f)
          .map(l => FileCdcDatabase.quickLongField(l, ChangeRecord.OffsetCol))
          .takeWhile(_ <= to)
          .filter(_ > from)
      }
      .toSeq.distinct.sorted

  override def offsetForTimestamp(path: String, tables: Seq[String],
      tsMs: Long): Long = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val first = tables.iterator
      .flatMap(t => FileCdcDatabase.dataFiles(path, t, "log"))
      .flatMap(FileCdcDatabase.lines)
      .map { l =>
        val n = mapper.readTree(l)
        (n.get(ChangeRecord.OffsetCol).asLong(),
          n.get(ChangeRecord.TsCol).asLong())
      }
      .filter(_._2 >= tsMs).map(_._1)
      .foldLeft(Long.MaxValue)(math.min)
    if (first == Long.MaxValue)
      tables.map(t => tableMeta(path, t).maxOffset).max
    else first - 1
  }
}
