package graft

import graft.cdc.ChangeRecord._
import graft.cdc.dialect.{Db2ChunkStatements, JdbcCdcDatabase,
  JdbcCdcDialect, JdbcChunkStatements, OracleChunkStatements,
  PostgresChunkStatements, SqlServerChunkStatements}
import graft.cdc.Materialize
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** The embedded-Derby JDBC dialect under the same battery as the file
  * dialect (CdcSourceSpec): chunked snapshot + watermark merge, changelog
  * replay, restart exactly-once — plus the dialect-specific surfaces: the
  * store-side uneven-chunk walk (selectNextChunkMax executed), the
  * database-answered rate probe, and the timestamp seek. */
class JdbcDialectSpec extends SparkSpecBase {

  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def snapshotDf: DataFrame =
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")

  private def changesDf(rows: Seq[(Long, String, Option[(Long, String)], Option[(Long, String)])]): DataFrame = {
    val schema = envelopeSchema(payload)
    val data = rows.map { case (off, op, before, after) =>
      Row(off, op, off * 10L, "graft", "t",
        before.map { case (i, v) => Row(i, v) }.orNull,
        after.map { case (i, v) => Row(i, v) }.orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  private val allEvents = Seq(
    (1L, "u", Some((1L, "v1")), Some((1L, "v1b"))),
    (2L, "d", Some((2L, "v2")), None),
    (3L, "c", None, Some((21L, "v21"))),
    (4L, "u", Some((3L, "v3")), Some((3L, "v3b"))),
    (5L, "d", Some((21L, "v21")), None),
    (6L, "c", None, Some((22L, "v22"))))

  private def writeDb(dir: String, upToOffset: Long): Unit =
    JdbcCdcDatabase.write(spark, dir, "t", "graft", "id",
      snapshot = snapshotDf,
      changes = changesDf(allEvents.filter(_._1 <= upToOffset)),
      force = true)

  private def read(dir: String, mode: String): DataFrame =
    spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", mode)
      .option("scan.incremental.snapshot.chunk.size", "5")
      .load()

  private val finalState: Set[(Long, String)] =
    ((1L to 20L).toSet - 2L).map {
      case 1L => (1L, "v1b"); case 3L => (3L, "v3b")
      case i => (i, s"v$i")
    } + ((22L, "v22"))

  test("batch initial: chunked snapshot merged with the full log") {
    val dir = tmpDir("jdbc-initial")
    writeDb(dir, 6L)
    val rows = read(dir, "initial").select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet === finalState)
    assert(rows.length === rows.distinct.length)
  }

  test("batch earliest: full changelog replay with retract rows") {
    val dir = tmpDir("jdbc-earliest")
    writeDb(dir, 6L)
    val ops = read(dir, "earliest")
      .groupBy(OpCol).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // 2 updates → 2×(-U,+U); 2 deletes → -D; 2 creates → +I
    assert(ops === Map("+I" -> 2L, "+U" -> 2L, "-U" -> 2L, "-D" -> 2L))
  }

  test("store-side uneven chunk walk: sparse keys split by query") {
    val dir = tmpDir("jdbc-sparse")
    // sparse keys: factor (max-min+1)/count >> upper bound → uneven split
    val sparse = Seq(1L, 2L, 3L, 100000L, 100001L, 100002L, 200000L,
      200001L, 300000L).map(i => (i, s"v$i")).toDF("id", "v")
    JdbcCdcDatabase.write(spark, dir, "t", "graft", "id",
      snapshot = sparse, changes = changesDf(Seq.empty), force = true)
    // the walk itself (executed selectNextChunkMax)
    assert(JdbcCdcDialect.nextChunkMax(dir, "t", "id", 1L, 3) === Some(3L))
    assert(JdbcCdcDialect.nextChunkMax(dir, "t", "id", 3L, 3) === Some(100001L))
    assert(JdbcCdcDialect.nextChunkMax(dir, "t", "id", 300001L, 3) === None)
    // end-to-end: all rows exactly once through the chunked read
    val df = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.chunk.size", "3")
      .load()
    val ids = df.select("id").collect().map(_.getLong(0))
    assert(ids.sorted === sparse.collect().map(_.getLong(0)).sorted)
    assert(ids.length === ids.distinct.length)
  }

  test("statement flavors: all five sets execute end-to-end on Derby") {
    // S4-S10 executed path: every flavor BUILDS its native statement text
    // (mysql backticks+LIMIT, sqlserver brackets+TOP, oracle ROWNUM walk,
    // postgres LIMIT) and the boundary translator bridges only grammar
    // Derby cannot parse — chunk scans, stats, log slices AND the
    // store-side chunk-max walk all run per flavor.
    for (flavor <- Seq("mysql-cdc", "sqlserver-cdc", "oracle-cdc",
        "postgres-cdc")) {
      val dir = tmpDir(s"jdbc-flavor-$flavor")
      writeDb(dir, 6L)
      def readF(mode: String): DataFrame =
        spark.read.format("graft-cdc")
          .option("path", dir).option("table", "t")
          .option("dialect", "jdbc")
          .option("dialect.flavor", flavor)
          .option("scan.startup.mode", mode)
          .option("scan.incremental.snapshot.chunk.size", "5")
          .load()
      // snapshot chunk scans + backfill merge (flavored chunkScan SQL)
      val rows = readF("initial").select("id", "v")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSet === finalState, s"flavor $flavor")
      assert(rows.length === rows.distinct.length, s"flavor $flavor")
      // changelog replay (flavored logScan SQL)
      val ops = readF("earliest").groupBy(OpCol).count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(ops === Map("+I" -> 2L, "+U" -> 2L, "-U" -> 2L, "-D" -> 2L),
        s"flavor $flavor")
      // stats (flavored selectMinMax)
      assert(JdbcCdcDialect.columnStats(dir, "t", "id")._1 >= 0L,
        s"flavor $flavor")
      // store-side walk now executes for EVERY flavor (native row-limit
      // syntax through the translator) — the reference's per-dialect
      // ChunkSplitter pushes the same walk into the store
      assert(JdbcCdcDialect.supportsChunkMaxQuery(dir), s"flavor $flavor")
      val sdir = tmpDir(s"jdbc-flavor-sparse-$flavor")
      val sparse = Seq(1L, 2L, 3L, 100000L, 100001L, 200000L, 300000L)
        .map(i => (i, s"v$i")).toDF("id", "v")
      JdbcCdcDatabase.write(spark, sdir, "t", "graft", "id",
        snapshot = sparse, changes = changesDf(Seq.empty), force = true)
      JdbcCdcDialect.setFlavor(sdir, flavor)
      // the walk statement itself, stepped (flavored selectNextChunkMax)
      assert(JdbcCdcDialect.nextChunkMax(sdir, "t", "id", 1L, 3)
        === Some(3L), s"flavor $flavor")
      assert(JdbcCdcDialect.nextChunkMax(sdir, "t", "id", 3L, 3)
        === Some(100001L), s"flavor $flavor")
      assert(JdbcCdcDialect.nextChunkMax(sdir, "t", "id", 300001L, 3)
        === None, s"flavor $flavor")
      val ids = spark.read.format("graft-cdc")
        .option("path", sdir).option("table", "t")
        .option("dialect", "jdbc").option("dialect.flavor", flavor)
        .option("scan.startup.mode", "initial")
        .option("scan.incremental.snapshot.chunk.size", "3")
        .load().select("id").collect().map(_.getLong(0))
      assert(ids.sorted === sparse.collect().map(_.getLong(0)).sorted,
        s"flavor $flavor")
      assert(ids.length === ids.distinct.length, s"flavor $flavor")
    }
    // the default flavor keeps the store-side walk
    val ddir = tmpDir("jdbc-flavor-default")
    writeDb(ddir, 6L)
    assert(JdbcCdcDialect.supportsChunkMaxQuery(ddir))
  }

  test("unknown dialect.flavor rejected with an actionable error") {
    val dir = tmpDir("jdbc-flavor-bad")
    writeDb(dir, 6L)
    val unknown = intercept[IllegalArgumentException] {
      spark.read.format("graft-cdc")
        .option("path", dir).option("table", "t")
        .option("dialect", "jdbc").option("dialect.flavor", "nosuch-cdc")
        .option("scan.startup.mode", "initial")
        .load().count()
    }
    assert(unknown.getMessage.contains("unknown dialect.flavor"),
      unknown.getMessage)
  }

  test("statement translator: native flavor grammar bridged, shape kept") {
    import graft.cdc.dialect.StatementTranslator._
    // mysql: backticks + LIMIT (StatementUtils.java:99-130 shape)
    assert(toDerby("mysql-cdc",
      JdbcChunkStatements.selectNextChunkMax("t", "id", 7)) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"t\" WHERE \"id\" >= ?" +
        " ORDER BY \"id\" ASC FETCH FIRST 7 ROWS ONLY) AS T")
    // sqlserver: brackets + TOP n
    assert(toDerby("sqlserver-cdc",
      SqlServerChunkStatements.selectNextChunkMax("t", "id", 7)) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"t\" WHERE \"id\" >= ?" +
        " ORDER BY \"id\" ASC FETCH FIRST 7 ROWS ONLY) AS T")
    // oracle: ROWNUM wrap + alias-less derived table (OracleUtils.java:121)
    assert(toDerby("oracle-cdc",
      OracleChunkStatements.selectNextChunkMax("t", "id", 7)) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"t\" WHERE \"id\" >= ?" +
        " ORDER BY \"id\" ASC FETCH FIRST 7 ROWS ONLY) AS T")
    // postgres: LIMIT only; db2 passes through untouched
    assert(toDerby("postgres-cdc",
      PostgresChunkStatements.selectNextChunkMax("t", "id", 7)) ===
      "SELECT MAX(\"id\") FROM (SELECT \"id\" FROM \"t\" WHERE \"id\" >= ?" +
        " ORDER BY \"id\" ASC FETCH FIRST 7 ROWS ONLY) AS T")
    val db2 = Db2ChunkStatements.selectNextChunkMax("t", "id", 7)
    assert(toDerby("db2-cdc", db2) === db2)
    // non-walk statements: only identifier quoting changes
    assert(toDerby("mysql-cdc",
      JdbcChunkStatements.selectMinMax("t", "id")) ===
      "SELECT MIN(\"id\"), MAX(\"id\") FROM \"t\"")
    assert(toDerby("sqlserver-cdc",
      SqlServerChunkStatements.logScan("t__log", "__offset", 3L, 9L)) ===
      "SELECT * FROM \"t__log\" WHERE \"__offset\" > 3 AND " +
        "\"__offset\" <= 9 ORDER BY \"__offset\" ASC")
  }

  test("chunk-key override: stats + chunk scans run on the override column") {
    val dir = tmpDir("jdbc-ckey")
    val pl = StructType(Seq(StructField("id", LongType),
      StructField("k2", LongType), StructField("v", StringType)))
    val snap = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 20L).map(i =>
        Row(i, 1000L - i, s"v$i"))), pl)
    JdbcCdcDatabase.write(spark, dir, "t", "graft", "id", snap,
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq.empty[Row]), envelopeSchema(pl)), force = true)
    // executed stats SQL on the override column
    assert(JdbcCdcDialect.columnStats(dir, "t", "k2") === (980L, 999L))
    val rows = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.chunk.size", "5")
      .option("scan.incremental.snapshot.chunk-key.column", "k2")
      .load()
      .select("id").collect().map(_.getLong(0))
    assert(rows.sorted === (1L to 20L).toArray)
    assert(rows.length === rows.distinct.length)
  }

  test("legacy non-incremental snapshot: one unbounded range read") {
    val dir = tmpDir("jdbc-legacy")
    writeDb(dir, 6L)
    val df = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.enabled", "false")
      .option("connection.pool.size", "4")
      .load()
    assert(df.rdd.getNumPartitions === 1)
    val rows = df.select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSet === finalState)
  }

  test("database-answered rate probe and timestamp seek") {
    val dir = tmpDir("jdbc-probe")
    writeDb(dir, 6L)
    assert(JdbcCdcDialect.offsetsBetween(dir, Seq("t"), 0L, 6L)
      === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(JdbcCdcDialect.offsetsBetween(dir, Seq("t"), 2L, 6L, limit = 2)
      === Seq(3L, 4L))
    // ts = offset*10 → first event at/after ts 30 is offset 3 → start at 2
    assert(JdbcCdcDialect.offsetForTimestamp(dir, Seq("t"), 30L) === 2L)
    // past the log end → head
    assert(JdbcCdcDialect.offsetForTimestamp(dir, Seq("t"), 1000L) === 6L)
  }

  test("jdbc sink rejects identifiers that cannot be used unquoted") {
    import graft.cdc.dialect.JdbcUpsertSink
    val dir = tmpDir("jdbc-sink-ident")
    def batchWith(colName: String): DataFrame = {
      val schema = StructType(Seq(StructField("id", LongType),
        StructField(colName, StringType),
        StructField(OpCol, StringType), StructField(OffsetCol, LongType),
        StructField(TsCol, LongType), StructField(DbCol, StringType),
        StructField(TableCol, StringType)))
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(1L, "x", "+I", 1L, 10L, "db", "t"))), schema)
    }
    // Derby reserved word as a column → up-front rejection, not a runtime
    // syntax error mid-merge
    val reserved = intercept[IllegalArgumentException](
      JdbcUpsertSink.mergeInto(batchWith("order"), Seq("id"), dir, "t_ok"))
    assert(reserved.getMessage.contains("order"))
    // non-identifier characters in table or column names
    val badTable = intercept[IllegalArgumentException](
      JdbcUpsertSink.mergeInto(batchWith("v"), Seq("id"), dir, "t;drop"))
    assert(badTable.getMessage.contains("t;drop"))
    val badCol = intercept[IllegalArgumentException](
      JdbcUpsertSink.mergeInto(batchWith("a-b"), Seq("id"), dir, "t_ok"))
    assert(badCol.getMessage.contains("a-b"))
    // a safe batch still goes through on the same path
    JdbcUpsertSink.mergeInto(batchWith("v"), Seq("id"), dir, "t_ok")
    assert(JdbcUpsertSink.readBack(spark, dir, "t_ok").count() === 1L)
  }

  test("jdbc sink: newest wins across batches, deletes apply, replay idempotent") {
    import graft.cdc.dialect.JdbcUpsertSink
    val dir = tmpDir("jdbc-sink")
    val pl = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def emitted(rows: Seq[(Long, String, Long, String)]): DataFrame = {
      val schema = StructType(pl.fields ++ Seq(
        StructField(OpCol, StringType), StructField(OffsetCol, LongType),
        StructField(TsCol, LongType), StructField(DbCol, StringType),
        StructField(TableCol, StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, v, off, op) =>
          Row(id, v, op, off, off * 10, "db", "t")
        }), schema)
    }
    val b1 = emitted(Seq((1L, "v1", 1L, "+I"), (2L, "v2", 2L, "+I")))
    val b2 = emitted(Seq((1L, "v1b", 3L, "+U"), (2L, null, 4L, "-D"),
      (3L, "v3", 5L, "+I")))
    JdbcUpsertSink.mergeInto(b1, Seq("id"), dir, "t_sink")
    JdbcUpsertSink.mergeInto(b2, Seq("id"), dir, "t_sink")
    def state() = JdbcUpsertSink.readBack(spark, dir, "t_sink")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state() === Set((1L, "v1b"), (3L, "v3")))
    // checkpoint replay of batch 2 must not change the table
    JdbcUpsertSink.mergeInto(b2, Seq("id"), dir, "t_sink")
    assert(state() === Set((1L, "v1b"), (3L, "v3")))
    // a stale batch (lower offsets) must also be a no-op
    JdbcUpsertSink.mergeInto(b1, Seq("id"), dir, "t_sink")
    assert(state() === Set((1L, "v1b"), (3L, "v3")))
  }

  test("restart exactly-once: snapshot batch, stop, more log, resume") {
    val dir = tmpDir("jdbc-restart")
    val out = tmpDir("jdbc-restart-out")
    val ckpt = tmpDir("jdbc-restart-ckpt")

    def runStream(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir).option("table", "t")
        .option("dialect", "jdbc")
        .option("scan.startup.mode", "initial")
        .option("scan.incremental.snapshot.chunk.size", "5")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeDb(dir, 3L)
    runStream()
    val phase1 = spark.read.parquet(out)
    assert(phase1.agg(org.apache.spark.sql.functions.max(OffsetCol))
      .collect()(0).getLong(0) === 3L)

    writeDb(dir, 6L) // recreate with the full log (offsets stable)
    runStream()      // resumes from committed offset 3

    val all = spark.read.parquet(out)
    val tail = all.filter(s"$OffsetCol > 3")
      .groupBy(OffsetCol, OpCol).count().collect()
    assert(tail.forall(_.getLong(2) === 1L), tail.mkString(","))
    assert(tail.map(_.getLong(0)).toSet === Set(4L, 5L, 6L))

    val state = Materialize.materialize(all, Seq("id"))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSet === finalState)
    assert(state.length === state.distinct.length)
  }
}
