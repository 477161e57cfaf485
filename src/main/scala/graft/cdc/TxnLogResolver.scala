package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TiDB-style transactional log resolution (SURVEY §2.4 T7): TiKV's CDC
 * stream delivers per-key PREWRITE / COMMIT / ROLLBACK events, and a row
 * becomes visible only when its COMMIT arrives with `commitTs` ≤ the
 * region's `resolvedTs` frontier. The reference buffers prewrites and
 * commits in TreeMaps keyed by (ts, key) and flushes on every resolvedTs
 * advance (flink-connector-tidb-cdc/.../TiKVRichParallelSourceFunction.java:
 * 86-87 buffers, :174-192 handleRow, :253-262 flushRows).
 *
 * Spark-first re-expression: resolution is a *relational* statement, not a
 * mutable buffer — prewrites anti-joined against rollbacks and equi-joined
 * to commits on (key, startTs), filtered to the resolved frontier. Each
 * join shuffles on the transaction key, so resolution scales out with the
 * cluster instead of being bounded by one reader's TreeMap heap; COMMITTED
 * events (reference :177-180, pre-joined rows) pass straight through the
 * same plan shape as a self-paired prewrite+commit.
 */
object TxnLogResolver {

  val Prewrite = "PREWRITE"
  val Commit = "COMMIT"
  val Rollback = "ROLLBACK"

  /**
   * events: DataFrame with columns
   *   kind STRING, key LONG, start_ts LONG, commit_ts LONG (null except on
   *   COMMIT), payload columns (on PREWRITE).
   * Returns the committed row images visible at `resolvedTs`, one row per
   * (key, start_ts), carrying the prewrite payload plus `commit_ts`.
   */
  def resolve(events: DataFrame, resolvedTs: Long): DataFrame = {
    val pre = events.filter(col("kind") === Prewrite).drop("kind", "commit_ts")
    val rb = events.filter(col("kind") === Rollback)
      .select(col("key").as("rb_key"), col("start_ts").as("rb_start_ts"))
    val cm = events.filter(col("kind") === Commit &&
        col("commit_ts") <= resolvedTs)
      .select(col("key").as("cm_key"), col("start_ts").as("cm_start_ts"),
        col("commit_ts"))
    pre
      .join(rb, col("key") === col("rb_key") &&
        col("start_ts") === col("rb_start_ts"), "left_anti")
      .join(cm, col("key") === col("cm_key") &&
        col("start_ts") === col("cm_start_ts"), "inner")
      .drop("cm_key", "cm_start_ts")
  }

  /** A single event in the local (reference-shaped) resolution path. */
  case class TxnEvent(kind: String, key: Long, startTs: Long,
      commitTs: Long, payload: String)

  /**
   * Single-reader reference semantics, for spec-level equivalence checks:
   * the exact TreeMap buffer dance of TiKVRichParallelSourceFunction
   * (handleRow :176-192 + flushRows :253-262), emitting committed payloads
   * in (commitTs, key) order up to `resolvedTs`.
   */
  def resolveLocal(events: Iterator[TxnEvent],
      resolvedTs: Long): Seq[(Long, Long, String)] = {
    val prewrites = scala.collection.mutable.Map[(Long, Long), String]()
    val commits = scala.collection.mutable.TreeMap[(Long, Long), (Long, Long)]()
    events.foreach { e =>
      e.kind match {
        case Prewrite => prewrites((e.startTs, e.key)) = e.payload
        case Commit => commits((e.commitTs, e.key)) = (e.startTs, e.key)
        case Rollback => prewrites.remove((e.startTs, e.key))
        case other => throw new IllegalArgumentException(s"txn kind $other")
      }
    }
    commits.iterator
      .takeWhile { case ((commitTs, _), _) => commitTs <= resolvedTs }
      .flatMap { case ((commitTs, key), pk) =>
        prewrites.get(pk).map(p => (commitTs, key, p))
      }
      .toSeq
  }
}
