package graft

import graft.cdc.dialect._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL a JDBC dialect runs per chunk — shapes mirror the reference's
  * StatementUtils (flink-connector-mysql-cdc/.../utils/StatementUtils.java). */
class JdbcChunkStatementsSpec extends AnyFunSuite {
  private val S = JdbcChunkStatements

  test("stats queries") {
    assert(S.selectMinMax("orders", "o_id") ===
      "SELECT MIN(`o_id`), MAX(`o_id`) FROM `orders`")
    assert(S.selectRowCount("orders") === "SELECT COUNT(1) FROM `orders`")
  }

  test("lazy uneven chunk walk (StatementUtils.java:99-130 shape)") {
    assert(S.selectNextChunkMax("orders", "o_id", 8096) ===
      "SELECT MAX(`o_id`) FROM (SELECT `o_id` FROM `orders` " +
        "WHERE `o_id` >= ? ORDER BY `o_id` ASC LIMIT 8096) AS T")
  }

  test("chunk scan bounds: unbounded first/last, half-open middle") {
    assert(S.chunkScan("t", "id", None, Some(100L)) ===
      "SELECT * FROM `t` WHERE `id` < 100")
    assert(S.chunkScan("t", "id", Some(100L), Some(200L)) ===
      "SELECT * FROM `t` WHERE `id` >= 100 AND `id` < 200")
    assert(S.chunkScan("t", "id", Some(200L), None) ===
      "SELECT * FROM `t` WHERE `id` >= 200")
    assert(S.chunkScan("t", "id", None, None) === "SELECT * FROM `t`")
  }

  test("log slice is offset-ordered half-open-left") {
    assert(S.logScan("cdc_orders", "lsn", 5L, 10L) ===
      "SELECT * FROM `cdc_orders` WHERE `lsn` > 5 AND `lsn` <= 10 " +
        "ORDER BY `lsn` ASC")
  }

  test("oracle flavor: double quotes + ROWNUM walk (OracleUtils.java:121-139)") {
    assert(OracleChunkStatements.selectNextChunkMax("ORDERS", "ID", 8096) ===
      "SELECT MAX(\"ID\") FROM (SELECT \"ID\" FROM \"ORDERS\" " +
        "WHERE \"ID\" >= ? ORDER BY \"ID\" ASC) WHERE ROWNUM <= 8096")
    assert(OracleChunkStatements.selectMinMax("ORDERS", "ID") ===
      "SELECT MIN(\"ID\"), MAX(\"ID\") FROM \"ORDERS\"")
    // ROWID chunk key stays unquoted (ChunkUtils.java:53-58 default key)
    assert(OracleChunkStatements.chunkScan("ORDERS",
      OracleChunkStatements.RowIdChunkKey, Some(1L), None) ===
      "SELECT * FROM \"ORDERS\" WHERE ROWID >= 1")
  }

  test("sqlserver flavor: brackets + TOP-n") {
    assert(SqlServerChunkStatements.selectNextChunkMax("orders", "id", 100) ===
      "SELECT MAX([id]) FROM (SELECT TOP 100 [id] FROM [orders] " +
        "WHERE [id] >= ? ORDER BY [id] ASC) AS T")
  }

  test("db2 flavor: FETCH FIRST n ROWS ONLY") {
    assert(Db2ChunkStatements.selectNextChunkMax("orders", "id", 100) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"orders\" " +
        "WHERE \"id\" >= ? ORDER BY \"id\" ASC " +
        "FETCH FIRST 100 ROWS ONLY) AS T")
  }

  test("postgres flavor: double quotes, standard LIMIT") {
    assert(PostgresChunkStatements.selectNextChunkMax("orders", "id", 100) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"orders\" " +
        "WHERE \"id\" >= ? ORDER BY \"id\" ASC LIMIT 100) AS T")
  }

  test("flavor registry keyed by reference connector names") {
    assert(DialectStatements.byConnector.keySet ===
      Set("mysql-cdc", "oracle-cdc", "postgres-cdc", "sqlserver-cdc",
        "db2-cdc"))
  }
}
