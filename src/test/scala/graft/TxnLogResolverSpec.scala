package graft

import graft.cdc.TxnLogResolver
import graft.cdc.TxnLogResolver.TxnEvent

/** TiDB prewrite/commit semantics (SURVEY §2.4 T7): the distributed
  * relational resolution must agree with the reference's TreeMap buffer
  * (TiKVRichParallelSourceFunction.java:174-262) on every case — rollback
  * drops, unresolved commits held back, arrival order irrelevant. */
class TxnLogResolverSpec extends SparkSpecBase {

  // deterministic pseudo-random event log: 200 txns, shuffled arrival
  private val txns: Seq[(Long, Long, String)] =
    (0L until 200L).map(k => (k, k * 10, s"payload_$k"))

  private def events: Seq[TxnEvent] = {
    val all = txns.flatMap { case (k, startTs, p) =>
      val pre = TxnEvent(TxnLogResolver.Prewrite, k, startTs, -1L, p)
      if (k % 7 == 3) Seq(pre, TxnEvent(TxnLogResolver.Rollback, k, startTs, -1L, null))
      else if (k % 11 == 0) Seq(pre, TxnEvent(TxnLogResolver.Commit, k, startTs, 999999L, null))
      else Seq(pre, TxnEvent(TxnLogResolver.Commit, k, startTs, startTs + 5, null))
    }
    // deterministic shuffle: order by a hash so prewrite/commit interleave
    all.sortBy(e => (e.key * 2654435761L + e.kind.hashCode) % 1000)
  }

  private val resolvedTs = 5000L

  test("local resolution matches hand-computed visibility") {
    val out = TxnLogResolver.resolveLocal(events.iterator, resolvedTs)
    val expectKeys = (0L until 200L)
      .filter(k => k % 7 != 3 && k % 11 != 0 && k * 10 + 5 <= resolvedTs)
    assert(out.map(_._2) === expectKeys) // commitTs order == key order here
    assert(out.forall { case (cts, k, p) =>
      cts == k * 10 + 5 && p == s"payload_$k" })
  }

  test("distributed relational resolution agrees with the local reference path") {
    val s = spark
    import s.implicits._
    val df = events.toDF("kind", "key", "start_ts", "commit_ts", "payload")
      .withColumn("commit_ts",
        org.apache.spark.sql.functions.when($"commit_ts" === -1L, null)
          .otherwise($"commit_ts"))
    val got = TxnLogResolver.resolve(df, resolvedTs)
      .select($"commit_ts", $"key", $"payload").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === TxnLogResolver.resolveLocal(events.iterator, resolvedTs))
  }

  test("a commit without its prewrite (lost region) emits nothing") {
    val orphan = Seq(TxnEvent(TxnLogResolver.Commit, 1L, 10L, 15L, null))
    assert(TxnLogResolver.resolveLocal(orphan.iterator, resolvedTs).isEmpty)
  }
}
