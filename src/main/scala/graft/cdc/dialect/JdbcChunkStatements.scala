package graft.cdc.dialect

/**
 * SQL statement builders a JDBC dialect's driver/executor tasks run — the
 * Spark-side re-expression of the reference's chunk SQL
 * (flink-connector-mysql-cdc/.../source/utils/StatementUtils.java): stats
 * queries (:38-77), the lazy uneven-chunk walk (:99-130), and the chunk
 * range scan (:132-188). A live-database dialect implements
 * [[CdcDialect.snapshotLines]] by executing [[chunkScan]] with a streaming
 * fetch size (reference default 1024, MySqlSourceOptions.java:111-116);
 * this object keeps the SQL generation testable without a database.
 *
 * Identifiers are quoted with backticks (MySQL-flavored, as the reference's
 * `quote(tableId)`); a per-database subclass overrides [[quote]].
 */
object JdbcChunkStatements extends JdbcChunkStatements

class JdbcChunkStatements extends Serializable {

  def quote(ident: String): String = s"`$ident`"

  /** min/max/row-count stats that drive the even/uneven split decision
    * (StatementUtils.java:38-77). */
  def selectMinMax(table: String, pk: String): String =
    s"SELECT MIN(${quote(pk)}), MAX(${quote(pk)}) FROM ${quote(table)}"

  def selectRowCount(table: String): String =
    s"SELECT COUNT(1) FROM ${quote(table)}"

  /** Next uneven-chunk end: the max key of the next `chunkSize` keys past
    * `includedLowerBound` (StatementUtils.java:99-130 — the lazy walk that
    * replaces a full key sort for sparse keys). */
  def selectNextChunkMax(table: String, pk: String, chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (" +
      s"SELECT ${quote(pk)} FROM ${quote(table)} " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC LIMIT $chunkSize" +
      s") AS T"

  /** Chunk range scan [lo, hi) with unbounded first/last chunks
    * (StatementUtils.buildSplitScanQuery, :132-188). */
  def chunkScan(table: String, pk: String,
      lo: Option[Long], hi: Option[Long]): String = {
    val cond = (lo, hi) match {
      case (None, None) => ""
      case (Some(l), None) => s" WHERE ${quote(pk)} >= $l"
      case (None, Some(h)) => s" WHERE ${quote(pk)} < $h"
      case (Some(l), Some(h)) =>
        s" WHERE ${quote(pk)} >= $l AND ${quote(pk)} < $h"
    }
    s"SELECT * FROM ${quote(table)}$cond"
  }

  /** Log slice query for a change-table-backed dialect (e.g. SQL Server CDC
    * tables / Oracle LogMiner views): offsets in (from, to], offset-ordered —
    * the contract [[CdcDialect.logLines]] expects. */
  def logScan(logTable: String, offsetCol: String,
      from: Long, to: Long): String =
    s"SELECT * FROM ${quote(logTable)} " +
      s"WHERE ${quote(offsetCol)} > $from AND ${quote(offsetCol)} <= $to " +
      s"ORDER BY ${quote(offsetCol)} ASC"
}
