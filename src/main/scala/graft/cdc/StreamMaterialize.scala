package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Streaming changelog materialization — the stateful half of the engine's
 * cdc-sql layer (SURVEY §7.1): Flink keeps retract-aggregate state inside
 * its operators; Spark's analogue is an explicit keyed state operator.
 *
 * [[upserts]] turns a *streaming* emitted changelog (`__op` rows) into a
 * per-key upsert stream via `flatMapGroupsWithState` (Update mode): state =
 * newest (offset, image) per key; each batch emits the key's new current
 * image, or a delete marker. [[UpsertSink.mergeInto]] is the `foreachBatch`
 * MERGE helper that keeps a parquet "table" equal to the materialized state.
 *
 * State is O(keys) with one row image each — the same asymptotics as the
 * host-engine aggregate state the reference relies on; at 100 TB key
 * cardinality this state shards across executors by the groupBy key and
 * lives in the state store (RocksDB in production configs).
 *
 * The payload travels JSON-encoded through the state machinery so the
 * operator works for any schema (a typed `Dataset[T]` variant is a
 * specialization, not a different code path).
 */
object StreamMaterialize {

  import ChangeRecord._

  /** (key, offset, op, image-json). Public: Catalyst's generated
    * (de)serializers must reach the class. */
  case class Ev(k: String, off: Long, op: String, img: String)
  /** Upsert output: op ∈ {+U, -D} applied at `off`; img null on delete. */
  case class Upsert(k: String, off: Long, op: String, img: String)
  case class KeyState(off: Long, op: String, img: String)

  /** Streaming changelog → per-key upsert stream (Update output mode). */
  def upserts(emitted: DataFrame, keyCols: Seq[String]): DataFrame = {
    val spark = emitted.sparkSession
    import spark.implicits._
    val payload = emitted.schema.fieldNames.filterNot(MetaCols.contains).toSeq
    val evs = emitted
      .filter(col(OpCol) =!= RowKind.UpdateBefore)
      .select(
        concat_ws(" ", keyCols.map(col): _*).as("k"),
        col(OffsetCol).as("off"),
        col(OpCol).as("op"),
        to_json(struct(payload.map(col): _*)).as("img"))
      .as[Ev]

    evs.groupByKey(_.k)
      .flatMapGroupsWithState[KeyState, Upsert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[KeyState]) =>
          val newest = rows.maxBy(_.off)
          val cur = state.getOption
          if (cur.exists(_.off >= newest.off)) Iterator.empty
          else {
            val op =
              if (newest.op == RowKind.Delete) RowKind.Delete
              else RowKind.UpdateAfter
            val img = if (op == RowKind.Delete) null else newest.img
            state.update(KeyState(newest.off, op, img))
            Iterator.single(Upsert(key, newest.off, op, img))
          }
      }
      .toDF()
  }

  /** Decode an upsert stream's image JSON back into payload columns
    * (delete markers drop out — they carry no image). */
  def decodeUpserts(ups: DataFrame, payload: StructType): DataFrame =
    ups.filter(col("op") =!= RowKind.Delete)
      .select(col("off").as(OffsetCol), from_json(col("img"), payload).as("p"))
      .select(col(OffsetCol) +:
        payload.fieldNames.toSeq.map(f => col(s"p.$f").as(f)): _*)
}

/**
 * `foreachBatch` upsert sink: maintains a parquet directory equal to the
 * materialized state of the changelog consumed so far. The stored state
 * keeps each key's `__offset`, so the merge is a keyed newest-wins
 * reduction and replayed micro-batches are idempotent — the exactly-once
 * story for non-transactional sinks (the reference's e2e tests assert sink
 * contents the same way, MySqlE2eITCase.java:89-133).
 */
object UpsertSink {

  import ChangeRecord._

  /** Merge one micro-batch of emitted changelog rows into `path`.
    * Stored schema: payload columns ++ `__offset`. */
  def mergeInto(spark: SparkSession, batch: DataFrame, keyCols: Seq[String],
      path: String): Unit = {
    val payload = batch.schema.fieldNames.filterNot(MetaCols.contains).toSeq
    val incoming = batch.select(
      (payload.map(col) :+ col(OpCol) :+ col(OffsetCol)): _*)
    val dir = new java.io.File(path)
    val combined =
      if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty) {
        val st = spark.read.parquet(path)
          .withColumn(OpCol, lit(RowKind.Insert))
          .select((payload.map(col) :+ col(OpCol) :+ col(OffsetCol)): _*)
        st.unionByName(incoming)
      } else incoming
    // newest image per key; deletes drop the key
    val img = struct((col(OpCol) +: col(OffsetCol) +: payload.map(col)): _*)
    val merged = combined
      .filter(col(OpCol) =!= RowKind.UpdateBefore)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(img, col(OffsetCol)).as("__v"))
      .filter(col(s"__v.$OpCol") =!= RowKind.Delete)
      .select((payload :+ OffsetCol).map(c => col(s"__v.$c").as(c)): _*)
    // overwrite via temp-dir swap — the move is the batch commit point;
    // checkpoint replay regenerates identical state
    val tmpDir = path + ".tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    deleteRecursively(dir)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpDir),
      java.nio.file.Paths.get(path))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val fs = f.listFiles()
      if (fs != null) fs.foreach(deleteRecursively)
    }
    f.delete()
  }
}
