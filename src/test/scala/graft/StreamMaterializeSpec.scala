package graft

import graft.cdc.ChangeRecord._
import graft.cdc.{FileCdcDatabase, StreamMaterialize, UpsertSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Stateful streaming materialization: flatMapGroupsWithState upserts and
  * the foreachBatch newest-wins MERGE sink. */
class StreamMaterializeSpec extends SparkSpecBase {

  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** Emitted-changelog rows (payload ++ meta). */
  private def emitted(rows: Seq[(Long, String, Long, String)]): DataFrame = {
    val schema = StructType(payload.fields ++ Seq(
      StructField(OpCol, StringType), StructField(OffsetCol, LongType),
      StructField(TsCol, LongType), StructField(DbCol, StringType),
      StructField(TableCol, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v, off, op) =>
        Row(id, v, op, off, off * 10, "db", "t")
      }), schema)
  }

  test("UpsertSink.mergeInto: newest wins across batches, idempotent replay") {
    val out = tmpDir("sink") + "/state"
    val b1 = emitted(Seq(
      (1L, "v1", 1L, "+I"), (2L, "v2", 2L, "+I")))
    val b2 = emitted(Seq(
      (1L, "v1b", 3L, "+U"), (2L, null, 4L, "-D"), (3L, "v3", 5L, "+I")))
    UpsertSink.mergeInto(spark, b1, Seq("id"), out)
    UpsertSink.mergeInto(spark, b2, Seq("id"), out)
    def state() = spark.read.parquet(out).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state() === Set((1L, "v1b"), (3L, "v3")))
    // replaying batch 2 (checkpoint recovery) must not change the state
    UpsertSink.mergeInto(spark, b2, Seq("id"), out)
    assert(state() === Set((1L, "v1b"), (3L, "v3")))
  }

  test("upserts: stateful stream emits newest image per key, delete wins") {
    // file CDC db: 5 rows; update id1 (off1), delete id2 (off2), update id1
    // again (off3) — rate-limited to 1 event per batch so state must carry
    // across micro-batches
    val dir = tmpDir("upserts-db")
    val snapshot = (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v")
    val env = StructType(Seq(
      StructField(OffsetCol, LongType), StructField(OpCol, StringType),
      StructField(TsCol, LongType), StructField(DbCol, StringType),
      StructField(TableCol, StringType),
      StructField(BeforeCol, payload), StructField(AfterCol, payload)))
    val changes = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "u", 10L, "graft", "t", Row(1L, "v1"), Row(1L, "v1a")),
      Row(2L, "d", 20L, "graft", "t", Row(2L, "v2"), null),
      Row(3L, "u", 30L, "graft", "t", Row(1L, "v1a"), Row(1L, "v1b")))), env)
    FileCdcDatabase.write(spark, dir, "t", "graft", "id", snapshot, changes,
      force = true)

    val name = s"ups_${System.nanoTime()}"
    val stream = spark.readStream.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("scan.startup.mode", "earliest")
      .option("scan.stream.max-events-per-trigger", "1")
      .load()
    val q = StreamMaterialize.upserts(stream, Seq("id"))
      .writeStream.format("memory").queryName(name).outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table(name)
      .select("k", "off", "op").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // id1 upserted twice (state advanced), id2 deleted
    assert(rows === Set(("1", 1L, "+U"), ("2", 2L, "-D"), ("1", 3L, "+U")))
  }
}
