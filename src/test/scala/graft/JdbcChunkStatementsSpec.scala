package graft

import graft.cdc.dialect.JdbcChunkStatements
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
}
