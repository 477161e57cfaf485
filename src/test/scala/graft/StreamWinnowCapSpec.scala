package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

/** The streaming winnow ingest's two keyed-state stages
  * (`cdc_stream_winnow_ingest`): per-digest exact-dedup state (stage 1)
  * and per-fingerprint bucket state capped at the batch index's df-cap
  * (stage 2). Mirrors StreamBucketCapSpec: a forced tiny cap proves the
  * saturation semantics against the arrival-rank mirror; the no-bind
  * license proves the default cap ([[DedupQueries.WinnowFpCap]]) caps
  * nothing on the fixture, so the oracle-pinned hashes are cap-free. */
class StreamWinnowCapSpec extends SparkSpecBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val CapProp = "graft.dedup.streamWinnowCap"

  private def withCap[A](cap: Int)(body: => A): A = {
    System.setProperty(CapProp, cap.toString)
    try body finally System.clearProperty(CapProp)
  }

  private def runIngest(): Map[(Long, Long), Long] =
    SparkEntry.queries("cdc_stream_winnow_ingest")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap

  /** Stage-1 mirror: the admitted corpus — base survivors (first arrival
    * per exact text) plus the first copy of each text whose base
    * survivor was deleted in phase 2. */
  private def admittedCorpus(): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
    val surv = base.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val copyAdm = base.select(col("doc_id").as("sid"), col("text"))
      .join(surv.select(col("text"), col("doc_id").as("sdoc")), "text")
      .filter(col("sid") % 100 === 1 && col("sdoc") % 13 === 3)
      .groupBy(col("text"))
      .agg((min(col("sid")) + 1000000000L).as("doc_id"))
    surv.select(col("doc_id"), col("text"))
      .unionByName(copyAdm.select(col("doc_id"), col("text")))
  }

  /** Stage-2 mirror: arrival-rank-capped bucket join over the admitted
    * corpus — the oracle's ranked/idx CTEs as DataFrames. */
  private def cappedMirror(adm: DataFrame, cap: Int)
      : Map[(Long, Long), Long] = {
    val fps = DedupQueries.winnowFpsOf(adm)
    val idx = fps.withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") <= cap).select(col("doc_id"), col("fp"))
    idx.as("x").join(idx.as("y"), col("x.fp") === col("y.fp")
        && col("x.doc_id") < col("y.doc_id"))
      .filter(!(col("y.doc_id") >= 1000000000L &&
        col("x.doc_id") < 1000000000L && col("x.doc_id") % 13 === 3))
      .groupBy(col("x.doc_id"), col("y.doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
  }

  test("cap=1: every bucket saturates on its first insert — the " +
    "streaming pair stream is empty") {
    val pairs = withCap(1)(runIngest())
    assert(pairs.isEmpty, s"cap=1 must pair nothing, got ${pairs.size}")
  }

  test("binding tiny cap: streaming surface equals the arrival-rank " +
    "mirror, pairs AND n_shared counts") {
    val adm = admittedCorpus().cache()
    val mirror = cappedMirror(adm, 3)
    val streamed = withCap(3)(runIngest())
    assert(streamed === mirror,
      s"only-stream=${streamed.toSet -- mirror.toSet} " +
        s"only-mirror=${mirror.toSet -- streamed.toSet}")
    adm.unpersist()
    ()
  }

  test("no-bind license: the fixture's hottest fingerprint is below " +
    "the default cap, so default-cap results are cap-free — and they " +
    "equal the mirror") {
    val adm = admittedCorpus().cache()
    val maxDf = DedupQueries.winnowFpsOf(adm)
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxDf <= DedupQueries.WinnowFpCap,
      s"hottest fingerprint df=$maxDf exceeds the default cap " +
        s"${DedupQueries.WinnowFpCap} — the no-bind license no longer " +
        "holds; re-pin the oracle")
    val mirror = cappedMirror(adm, DedupQueries.WinnowFpCap)
    val streamed = runIngest()
    assert(streamed === mirror,
      s"only-stream=${streamed.toSet -- mirror.toSet} " +
        s"only-mirror=${mirror.toSet -- streamed.toSet}")
    adm.unpersist()
    ()
  }

  test("digestStep: duplicate suppressed; deleting the survivor retires " +
    "it and re-opens the digest; deleting a suppressed dup is a no-op") {
    import DedupQueries.{DigestState, WinnowDocEvt}
    import graft.cdc.ChangeRecord.RowKind
    def ev(id: Long, off: Long, op: String) =
      WinnowDocEvt("dg", id, off, op, Seq(1L, 2L))
    // first arrival admits; identical text (same digest) suppressed
    val st1 = TestGroupState.create[DigestState](
      org.apache.spark.api.java.Optional.empty[DigestState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = DedupQueries.digestStep("dg", Iterator(
      ev(10, 1, RowKind.Insert), ev(11, 2, RowKind.Insert)), st1).toSeq
    assert(out1.map(_.doc_id) === Seq(10L))
    assert(st1.get === DigestState(10L, live = true))
    // delete of the suppressed dup: no emission, state unchanged
    val out2 = DedupQueries.digestStep("dg",
      Iterator(ev(11, 3, RowKind.Delete)), st1).toSeq
    assert(out2.isEmpty && st1.get === DigestState(10L, live = true))
    // delete of the survivor: retirement emitted, digest re-opens,
    // next identical text is admitted as the new survivor
    val out3 = DedupQueries.digestStep("dg", Iterator(
      ev(10, 4, RowKind.Delete), ev(12, 5, RowKind.Insert)), st1).toSeq
    assert(out3.map(e => (e.doc_id, e.op)) ===
      Seq((10L, RowKind.Delete), (12L, RowKind.Insert)))
    assert(st1.get === DigestState(12L, live = true))
  }

  test("winnowBucketStep: deletes free membership but never the " +
    "arrival slot; a live re-insert fails loudly") {
    import DedupQueries.{WinnowBucketState, WinnowFpEvt, WinnowPairEvt}
    import graft.cdc.ChangeRecord.RowKind
    def ev(id: Long, off: Long, op: String) = WinnowFpEvt(7L, id, off, op)
    val st = TestGroupState.create[WinnowBucketState](
      org.apache.spark.api.java.Optional.empty[WinnowBucketState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // cap=2: a inserted, a deleted, b inserted (slot 2 of 2, pairs with
    // nothing — a is gone), c arrives at a saturated bucket (dropped)
    val out = DedupQueries.winnowBucketStep(2L)(7L, Iterator(
      ev(1, 1, RowKind.Insert), ev(1, 2, RowKind.Delete),
      ev(2, 3, RowKind.Insert), ev(3, 4, RowKind.Insert)), st).toSeq
    assert(out.isEmpty, s"no pair can form: $out")
    assert(st.get === WinnowBucketState(Seq(2L), 3L))
    // d pairs with nothing either: the bucket is hot forever
    val out2 = DedupQueries.winnowBucketStep(2L)(7L,
      Iterator(ev(4, 5, RowKind.Insert)), st).toSeq
    assert(out2.isEmpty && st.get === WinnowBucketState(Seq(2L), 4L))
    // re-inserting the live member 2 violates the loud precondition
    val ex = intercept[IllegalArgumentException] {
      DedupQueries.winnowBucketStep(2L)(7L,
        Iterator(ev(2, 6, RowKind.Insert)), st).toSeq
    }
    assert(ex.getMessage.contains("no-reinsert"))
  }
}
