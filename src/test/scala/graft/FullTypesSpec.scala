package graft

import graft.cdc.{ChangeRecord, FileCdcDatabase}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Full-type round trip through the CDC source — the analogue of the
  * reference's `column_type_test.sql` ITCase (40+-column `full_types`
  * table, MySqlConnectorITCase full-type test): every §1.3 type written to
  * the file database and read back through `graft-cdc`, including the
  * ARRAY/MAP/ROW types the reference only supports via its MongoDB BSON
  * converter (MongoDBConnectorDeserializationSchema.java:220-272). */
class FullTypesSpec extends SparkSpecBase {

  private val payload = StructType(Seq(
    StructField("id", LongType),
    StructField("c_bool", BooleanType),
    StructField("c_byte", ByteType),
    StructField("c_short", ShortType),
    StructField("c_int", IntegerType),
    StructField("c_long", LongType),
    StructField("c_float", FloatType),
    StructField("c_double", DoubleType),
    StructField("c_dec", DecimalType(12, 3)),
    StructField("c_str", StringType),
    StructField("c_bin", BinaryType),
    StructField("c_date", DateType),
    StructField("c_ts", TimestampType),
    StructField("c_arr", ArrayType(IntegerType)),
    StructField("c_map", MapType(StringType, LongType)),
    StructField("c_row", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def mkRow(id: Long): Row = Row(
    id, id % 2 == 0, (id % 100).toByte, (id * 3).toShort, id.toInt * 7,
    id * 1000000007L, id * 0.5f, id * 0.25d,
    new java.math.BigDecimal(s"$id.125"), s"s$id",
    Array[Byte](id.toByte, (id + 1).toByte),
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000 + id)),
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + id)),
    Seq(id.toInt, id.toInt + 1), Map(s"k$id" -> id),
    Row(id.toInt, s"b$id"))

  test("every supported type survives snapshot + change round trip") {
    val dir = tmpDir("cdc-fulltypes")
    val rows = (1L to 10L).map(mkRow)
    val snapshot = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), payload)
    // one update event so the log path decodes the full type set too
    val env = ChangeRecord.envelopeSchema(payload)
    val updated = mkRow(5L)
    val changes = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "u", 10L, "graft", "ft", mkRow(5L), updated))), env)
    FileCdcDatabase.write(spark, dir, "ft", "graft", "id",
      snapshot, changes, snapshotPartitions = 2, force = true)

    val got = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "ft")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.chunk.size", "4")
      .load()
      .select(payload.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("id")
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      payload.map(f => (f.name, f.dataType)))

    val want = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), payload).orderBy("id")
    // row-by-row equality including nested/binary values
    val g = got.collect(); val w = want.collect()
    assert(g.length === w.length)
    g.zip(w).foreach { case (a, b) =>
      payload.fieldNames.zipWithIndex.foreach { case (n, i) =>
        (a.get(i), b.get(i)) match {
          case (x: Array[Byte], y: Array[Byte]) =>
            assert(x.sameElements(y), s"col $n")
          case (x, y) => assert(x === y, s"col $n")
        }
      }
    }
  }

  test("relational type set survives the JDBC (Derby) dialect round trip") {
    // real database columns: the relational subset (nested ARRAY/MAP/ROW
    // travel only in the log envelope's JSON, as with a real server)
    val relational = StructType(payload.fields.filterNot(f =>
      f.name == "c_arr" || f.name == "c_map" || f.name == "c_row"))
    def mkRel(id: Long): Row = Row.fromSeq(
      mkRow(id).toSeq.zip(payload.fields).collect {
        case (v, f) if relational.fieldNames.contains(f.name) => v
      })
    val dir = tmpDir("jdbc-fulltypes")
    val rows = (1L to 10L).map(mkRel)
    val snapshot = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), relational)
    val env = ChangeRecord.envelopeSchema(relational)
    val changes = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "u", 10L, "graft", "ft", mkRel(5L), mkRel(5L)))), env)
    graft.cdc.dialect.JdbcCdcDatabase.write(spark, dir, "ft", "graft", "id",
      snapshot, changes, force = true)

    val got = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "ft")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.chunk.size", "4")
      .load()
      .select(relational.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("id")
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      relational.map(f => (f.name, f.dataType)))
    val g = got.collect()
    val w = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), relational).orderBy("id").collect()
    assert(g.length === w.length)
    g.zip(w).foreach { case (a, b) =>
      relational.fieldNames.zipWithIndex.foreach { case (n, i) =>
        (a.get(i), b.get(i)) match {
          case (x: Array[Byte], y: Array[Byte]) =>
            assert(x.sameElements(y), s"col $n")
          case (x, y) => assert(x === y, s"col $n")
        }
      }
    }
  }

  test("empty table: zero-row snapshot plans and reads cleanly (both dialects)") {
    val pl = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]), pl)
    val noChanges = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]),
      ChangeRecord.envelopeSchema(pl))
    val fdir = tmpDir("cdc-empty-file")
    FileCdcDatabase.write(spark, fdir, "e", "graft", "id", empty, noChanges,
      force = true)
    assert(spark.read.format("graft-cdc")
      .option("path", fdir).option("table", "e")
      .option("scan.startup.mode", "initial").load().count() === 0L)
    val jdir = tmpDir("cdc-empty-jdbc")
    graft.cdc.dialect.JdbcCdcDatabase.write(spark, jdir, "e", "graft", "id",
      empty, noChanges, force = true)
    assert(spark.read.format("graft-cdc")
      .option("path", jdir).option("table", "e")
      .option("dialect", "jdbc")
      .option("scan.startup.mode", "initial").load().count() === 0L)
  }

  test("null values in every column decode as null") {
    val dir = tmpDir("cdc-fulltypes-null")
    val rows = Seq(Row.fromSeq(1L +: Seq.fill(payload.size - 1)(null)))
    val snapshot = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), payload)
    val changes = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]),
      ChangeRecord.envelopeSchema(payload))
    FileCdcDatabase.write(spark, dir, "ftn", "graft", "id",
      snapshot, changes, force = true)
    val got = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "ftn")
      .option("scan.startup.mode", "initial").load()
      .select(payload.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    assert(got.length === 1)
    (1 until payload.size).foreach(i => assert(got(0).isNullAt(i), s"col $i"))
  }

  test("server-time-zone shifts zoneless TIMESTAMP wire strings " +
    "(RowDataDebeziumDeserializeSchema.java:469-530)") {
    import graft.cdc.source.JsonRowCodec
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    def decodeMicros(codec: JsonRowCodec, s: String): Long =
      codec.decode(s"""{"ts":"$s"}""").getLong(0)
    val utc = new JsonRowCodec(schema) // default zone
    val sha = new JsonRowCodec(schema, "Asia/Shanghai")
    val berlin = new JsonRowCodec(schema, "Europe/Berlin")
    val wall = "2024-01-15T12:00:00"
    val base = decodeMicros(utc, wall)
    // Shanghai wall noon is 8 h before UTC wall noon on the epoch timeline
    assert(decodeMicros(sha, wall) === base - 8L * 3600 * 1000000)
    // Berlin in January is CET (+01:00)
    assert(decodeMicros(berlin, wall) === base - 1L * 3600 * 1000000)
    // explicit offsets are absolute: server-time-zone must NOT shift them
    val zoned = "2024-01-15T12:00:00Z"
    assert(decodeMicros(sha, zoned) === base)
    assert(decodeMicros(berlin, "2024-01-15T13:00:00+01:00") === base)
    // an invalid zone fails analysis-time validation, not per row
    val e = intercept[IllegalArgumentException] {
      graft.cdc.source.CdcSourceConfig(path = "/tmp/x", table = "t",
        startupMode = "initial", chunkSize = 1, changelogMode = "all",
        serverTimeZone = "Not/AZone")
    }
    assert(e.getMessage.contains("server-time-zone"))
  }
}
