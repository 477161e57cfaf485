package graft.cdc

import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * The file-backed "database" behind the test dialect (SURVEY §5 adaptation):
 * a directory per table holding
 *
 *   <dir>/<table>/snapshot/…jsonl   full rows, state at offset 0
 *   <dir>/<table>/log/…jsonl        envelope records (ChangeRecord schema),
 *                                   offsets > 0, sorted within a file
 *   <dir>/<table>/meta.json         pk, schema DDL, row stats, max offset
 *
 * stands in for a live database + transaction log, the way the reference's
 * tests use Testcontainers databases (SURVEY §5). JSONL is written by Spark
 * itself (`df.write.json`), decoded executor-side by [[source.JsonRowCodec]].
 */
object FileCdcDatabase {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Per-snapshot-file PK stats (file is a basename under <table>/snapshot):
    * rows are range-partitioned and sorted by PK at write time, so chunk
    * readers prune non-overlapping files and stop early — the file-dialect
    * analogue of parquet row-group min/max pruning / the WHERE-clause range
    * scan a JDBC dialect pushes to the database (StatementUtils.java:132-188). */
  case class FileRange(file: String, minPk: Long, maxPk: Long)

  case class TableMeta(
      table: String,
      db: String,
      pk: String,
      schemaDdl: String,
      rowCount: Long,
      minPk: Long,
      maxPk: Long,
      maxOffset: Long,
      snapshotFiles: Seq[FileRange] = Seq.empty) {
    def schema: StructType = StructType.fromDDL(schemaDdl)
  }

  /** Write a table (snapshot state at offset 0) + its change log. Driver-side
    * fixture generation only; idempotent (skips if already written). */
  def write(spark: SparkSession, dir: String, table: String, db: String,
      pk: String, snapshot: DataFrame, changes: DataFrame,
      snapshotPartitions: Int = 1, force: Boolean = false): Unit = {
    val root = Paths.get(dir, table)
    val donePath = root.resolve("_WRITTEN")
    if (!force && Files.exists(donePath)) return
    val stats = snapshot.agg(
      count(lit(1)), min(col(pk)).cast("long"), max(col(pk)).cast("long"))
      .collect()(0)
    val maxOff = changes.agg(coalesce(max(col(ChangeRecord.OffsetCol)), lit(0L)))
      .collect()(0).getLong(0)

    // Range-partition + sort the snapshot by PK so readers can prune whole
    // files against a chunk range and early-terminate inside a file.
    snapshot.repartitionByRange(snapshotPartitions, col(pk))
      .sortWithinPartitions(col(pk))
      .write.mode("overwrite").option("timestampFormat", TsFmt)
      .json(root.resolve("snapshot").toString)
    changes.orderBy(col(ChangeRecord.OffsetCol))
      .coalesce(1)
      .write.mode("overwrite").option("timestampFormat", TsFmt)
      .json(root.resolve("log").toString)

    // Per-file PK stats: files are PK-sorted, so min/max = first/last line.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fileRanges = dataFiles(dir, table, "snapshot").flatMap { f =>
      var first: String = null; var last: String = null
      val it = lines(f)
      while (it.hasNext) {
        val l = it.next()
        if (first == null) first = l
        last = l
      }
      if (first == null) None
      else Some(FileRange(Paths.get(f).getFileName.toString,
        mapper.readTree(first).get(pk).asLong(),
        mapper.readTree(last).get(pk).asLong()))
    }

    val meta = TableMeta(table, db, pk, snapshot.schema.toDDL,
      stats.getLong(0), stats.getLong(1), stats.getLong(2), maxOff,
      fileRanges)
    Files.writeString(root.resolve("meta.json"), metaToJson(meta))
    Files.writeString(donePath, "ok")
  }

  def readMeta(dir: String, table: String): TableMeta = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(
      Files.readString(Paths.get(dir, table, "meta.json")))
    val files = Option(n.get("snapshotFiles")).map(_.elements().asScala.map {
      e => FileRange(e.get("file").asText(), e.get("minPk").asLong(),
        e.get("maxPk").asLong())
    }.toSeq).getOrElse(Seq.empty)
    TableMeta(n.get("table").asText(), n.get("db").asText(),
      n.get("pk").asText(), n.get("schemaDdl").asText(),
      n.get("rowCount").asLong(), n.get("minPk").asLong(),
      n.get("maxPk").asLong(), n.get("maxOffset").asLong(), files)
  }

  /** Fast path: pull the first occurrence of an integer field out of a JSONL
    * line without building a tree. None when the pattern is absent or not a
    * plain integer (caller falls back to a full decode). */
  def quickLongFieldOpt(line: String, field: String): Option[Long] = {
    val key = "\"" + field + "\":"
    val i = line.indexOf(key)
    if (i < 0) return None
    val j = i + key.length
    var end = j
    while (end < line.length &&
      (line.charAt(end).isDigit || (end == j && line.charAt(end) == '-')))
      end += 1
    if (end == j) None
    else
      try Some(line.substring(j, end).toLong)
      catch { case _: NumberFormatException => None }
  }

  /** [[quickLongFieldOpt]] with a Jackson fallback — for top-level fields
    * that are always present (e.g. `__offset` in log lines). */
  def quickLongField(line: String, field: String): Long =
    quickLongFieldOpt(line, field).getOrElse(
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(line).get(field).asLong())

  /** Tables present under `dir` (reference: discoverDataCollections,
    * DataSourceDialect.java:45-52). */
  def discoverTables(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq.empty
    Files.list(p).iterator().asScala
      .filter(d => Files.exists(d.resolve("meta.json")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** Data files of a table section ("snapshot" or "log"), sorted by name. */
  def dataFiles(dir: String, table: String, section: String): Seq[String] = {
    val p = Paths.get(dir, table, section)
    if (!Files.isDirectory(p)) return Seq.empty
    Files.list(p).iterator().asScala
      .map(_.toString)
      .filter(f => f.endsWith(".json") || f.endsWith(".txt") || f.endsWith(".jsonl"))
      .toSeq.sorted
  }

  /** Iterate the lines of a JSONL file (executor-side). */
  def lines(file: String): Iterator[String] = {
    val src = scala.io.Source.fromFile(file, StandardCharsets.UTF_8.name())
    src.getLines()
  }

  private def metaToJson(m: TableMeta): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val files = m.snapshotFiles.map(f =>
      s"""{"file":${q(f.file)},"minPk":${f.minPk},"maxPk":${f.maxPk}}""")
      .mkString("[", ",", "]")
    s"""{"table":${q(m.table)},"db":${q(m.db)},"pk":${q(m.pk)},
       |"schemaDdl":${q(m.schemaDdl)},"rowCount":${m.rowCount},
       |"minPk":${m.minPk},"maxPk":${m.maxPk},"maxOffset":${m.maxOffset},
       |"snapshotFiles":$files}""".stripMargin
  }
}
