package graft

import graft.cdc.ChangeRecord._
import graft.cdc.FileCdcDatabase
import graft.cdc.source.SnapshotOverlayCache
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The per-executor shared snapshot-overlay cache: the shared (unfiltered)
  * and oversized-fallback (span-filtered) modes must merge identically. */
class OverlayCacheSpec extends SparkSpecBase {

  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("oversized overlay falls back to span-filtered builds, same result") {
    val dir = tmpDir("ovl-db")
    val snapshot = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val env = StructType(Seq(
      StructField(OffsetCol, LongType), StructField(OpCol, StringType),
      StructField(TsCol, LongType), StructField(DbCol, StringType),
      StructField(TableCol, StringType),
      StructField(BeforeCol, payload), StructField(AfterCol, payload)))
    // updates + deletes spread across the key space → the overlay holds
    // many keys, far over a cap of 1
    val changes = spark.createDataFrame(spark.sparkContext.parallelize(
      (1L to 200L by 10L).map(i =>
        Row(i, "u", i * 10L, "graft", "t", Row(i, s"v$i"), Row(i, s"u$i")))
        ++ (5L to 200L by 25L).map(i =>
          Row(1000L + i, "d", i * 100L, "graft", "t", Row(i, s"v$i"), null))),
      env)
    FileCdcDatabase.write(spark, dir, "t", "graft", "id", snapshot, changes,
      force = true)

    def readAll(): Set[(Long, String)] =
      spark.read.format("graft-cdc")
        .option("path", dir).option("table", "t")
        .option("scan.startup.mode", "initial")
        .option("scan.incremental.snapshot.chunk.size", "20")
        .load().select("id", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val origCap = SnapshotOverlayCache.MaxEntries
    try {
      SnapshotOverlayCache.clear()
      val shared = readAll()
      // every partition must now take the span-filtered local build
      SnapshotOverlayCache.MaxEntries = 1
      SnapshotOverlayCache.clear()
      val fallback = readAll()
      assert(shared === fallback)
      // sanity: merge actually applied updates and deletes
      assert(shared.contains((1L, "u1")) && !shared.exists(_._1 == 5L))
      assert(shared.size === 200 - 8)
    } finally {
      SnapshotOverlayCache.MaxEntries = origCap
      SnapshotOverlayCache.clear()
    }
  }
}
