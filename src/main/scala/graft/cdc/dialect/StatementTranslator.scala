package graft.cdc.dialect

/**
 * Boundary translation of a dialect's NATIVE SQL into the embedded
 * engine's (Derby) grammar. Each flavor BUILDS its own statements exactly
 * as its database requires — MySQL backticks + LIMIT
 * (flink-connector-mysql-cdc/.../source/utils/StatementUtils.java:99-224),
 * SQL Server brackets + TOP, Oracle ROWNUM-wrapped walk
 * (flink-connector-oracle-cdc/.../source/utils/OracleUtils.java:121-139),
 * Postgres LIMIT — and this translator rewrites only the grammar the
 * embedded engine cannot parse, preserving the statement SHAPE (the
 * MAX-over-ordered-limited-subquery walk stays a walk). In a real
 * deployment the native text goes over the wire untranslated; here the
 * "server" is Derby, so this layer plays the wire's role and every
 * flavor's chunk/stats/log SQL runs on the executed path.
 */
object StatementTranslator {

  def toDerby(connector: String, sql: String): String = connector match {
    case "mysql-cdc"     => limitToFetch(backticksToQuotes(sql))
    case "postgres-cdc"  => limitToFetch(sql)
    case "sqlserver-cdc" => topToFetch(bracketsToQuotes(sql))
    case "oracle-cdc"    => rownumToFetch(sql)
    case _               => sql // db2-cdc: Derby parses it natively
  }

  /** MySQL `` `ident` `` → `"ident"`. Identifiers containing a backtick
    * are impossible here: the builders quote simple names only. */
  private[dialect] def backticksToQuotes(sql: String): String =
    sql.replaceAll("`([^`]*)`", "\"$1\"")

  /** SQL Server `[ident]` → `"ident"`. */
  private[dialect] def bracketsToQuotes(sql: String): String =
    sql.replaceAll("\\[([^\\]]*)\\]", "\"$1\"")

  /** MySQL/Postgres trailing row limit → SQL-standard FETCH FIRST. */
  private[dialect] def limitToFetch(sql: String): String =
    sql.replaceAll("LIMIT (\\d+)", "FETCH FIRST $1 ROWS ONLY")

  /** SQL Server `SELECT TOP n …` → standard fetch clause at the end of
    * the subquery the TOP governed (the walk's fixed `) AS T` tail). */
  private[dialect] def topToFetch(sql: String): String =
    "SELECT TOP (\\d+) ".r.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val n = m.group(1)
        val stripped = sql.replaceFirst("SELECT TOP \\d+ ", "SELECT ")
        if (stripped.endsWith(") AS T"))
          stripped.stripSuffix(") AS T") +
            s" FETCH FIRST $n ROWS ONLY) AS T"
        else stripped + s" FETCH FIRST $n ROWS ONLY"
    }

  /** Oracle `(…) WHERE ROWNUM <= n` → fetch clause inside the subquery
    * plus the derived-table alias Derby requires (Oracle allows an
    * alias-less derived table; Derby does not). */
  private[dialect] def rownumToFetch(sql: String): String =
    "\\) WHERE ROWNUM <= (\\d+)".r.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val n = m.group(1)
        sql.replaceFirst("\\) WHERE ROWNUM <= \\d+",
          s" FETCH FIRST $n ROWS ONLY) AS T")
    }
}
