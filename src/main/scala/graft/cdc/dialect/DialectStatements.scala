package graft.cdc.dialect

/**
 * Per-database SQL flavors of [[JdbcChunkStatements]] — the statement-level
 * surface of the reference's non-MySQL dialects (SURVEY §2.1 S4–S8), kept
 * testable without a live database. Each mirrors the identifier quoting and
 * row-limit syntax its database actually requires:
 *
 *  - Oracle: double-quoted identifiers and a ROWNUM-wrapped subquery for the
 *    lazy uneven-chunk walk (flink-connector-oracle-cdc/.../source/utils/
 *    OracleUtils.java:121-139 `queryNextChunkMax`, quote :336-338). Oracle
 *    also defaults the chunk key to ROWID when no numeric PK exists
 *    (flink-connector-oracle-cdc/.../util/ChunkUtils.java:53-58) — exposed
 *    here as [[OracleChunkStatements.RowIdChunkKey]].
 *  - Postgres: double-quoted identifiers, standard LIMIT
 *    (flink-connector-postgres-cdc delegates chunking to the generic
 *    flink-cdc-base JdbcSourceChunkSplitter).
 *  - SQL Server: bracket-quoted identifiers and TOP-n instead of LIMIT.
 *  - Db2: double-quoted identifiers and FETCH FIRST n ROWS ONLY.
 */
object OracleChunkStatements extends JdbcChunkStatements {
  /** Chunk-key column used when the table has no splittable numeric PK. */
  val RowIdChunkKey = "ROWID"

  override def quote(ident: String): String =
    if (ident == RowIdChunkKey) ident else "\"" + ident + "\""

  override def selectNextChunkMax(table: String, pk: String,
      chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (" +
      s"SELECT ${quote(pk)} FROM ${quote(table)} " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC" +
      s") WHERE ROWNUM <= $chunkSize"
}

object PostgresChunkStatements extends JdbcChunkStatements {
  override def quote(ident: String): String = "\"" + ident + "\""
}

object SqlServerChunkStatements extends JdbcChunkStatements {
  override def quote(ident: String): String = s"[$ident]"

  override def selectNextChunkMax(table: String, pk: String,
      chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (" +
      s"SELECT TOP $chunkSize ${quote(pk)} FROM ${quote(table)} " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC" +
      s") AS T"
}

object Db2ChunkStatements extends JdbcChunkStatements {
  override def quote(ident: String): String = "\"" + ident + "\""

  override def selectNextChunkMax(table: String, pk: String,
      chunkSize: Int): String =
    s"SELECT MAX(${quote(pk)}) FROM (" +
      s"SELECT ${quote(pk)} FROM ${quote(table)} " +
      s"WHERE ${quote(pk)} >= ? ORDER BY ${quote(pk)} ASC " +
      s"FETCH FIRST $chunkSize ROWS ONLY" +
      s") AS T"
}

/** Flavor registry, keyed by the connector names the reference's DDL uses. */
object DialectStatements {
  val byConnector: Map[String, JdbcChunkStatements] = Map(
    "mysql-cdc" -> JdbcChunkStatements,
    "oracle-cdc" -> OracleChunkStatements,
    "postgres-cdc" -> PostgresChunkStatements,
    "sqlserver-cdc" -> SqlServerChunkStatements,
    "db2-cdc" -> Db2ChunkStatements)
}
