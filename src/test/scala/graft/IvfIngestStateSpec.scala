package graft

import graft.cdc.ChangeRecord.RowKind
import graft.queries.SimilarityQueries
import graft.queries.SimilarityQueries.{CellEvt, CellState, CellVer}
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

/** State-transition contract for the streaming IVF posting-list cell:
  * exact emits under insert/delete interleaving, upsert/no-op edge cases,
  * state round-trip across batches, and linear cost at 10^4 events in
  * one cell per batch (the O(postings^2)-per-batch regression guard). */
class IvfIngestStateSpec extends AnyFunSuite {

  private def run(evts: Seq[CellEvt],
      prior: Option[CellState] = None): (Seq[CellVer], CellState) = {
    val st = TestGroupState.create[CellState](
      prior match {
        case Some(p) => org.apache.spark.api.java.Optional.of(p)
        case None => org.apache.spark.api.java.Optional.empty[CellState]()
      },
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = SimilarityQueries.ivfCellTransition(7, evts.iterator, st).toSeq
    (out, st.get)
  }

  private def ins(off: Long, id: Long) =
    CellEvt(7, off, id, RowKind.Insert)
  private def del(off: Long, id: Long) =
    CellEvt(7, off, id, RowKind.Delete)

  test("insert/delete interleaving emits exact running (size, sum)") {
    val (out, st) = run(Seq(ins(1, 10), ins(2, 20), del(3, 10), ins(4, 30)))
    assert(out === Seq(
      CellVer(7, 1, 1, 10), CellVer(7, 2, 2, 30),
      CellVer(7, 3, 1, 20), CellVer(7, 4, 2, 50)))
    assert(st === CellState(Seq(20L, 30L), 50L))
  }

  test("events are applied in offset order regardless of arrival order") {
    val (out, _) = run(Seq(ins(4, 30), del(3, 10), ins(1, 10), ins(2, 20)))
    assert(out.map(_.off) === Seq(1L, 2L, 3L, 4L))
    assert(out.last === CellVer(7, 4, 2, 50))
  }

  test("delete of an absent id and re-insert of a live id are no-ops") {
    val (out, st) = run(Seq(ins(1, 10), del(2, 99), ins(3, 10)))
    assert(out === Seq(
      CellVer(7, 1, 1, 10), CellVer(7, 2, 1, 10), CellVer(7, 3, 1, 10)))
    assert(st === CellState(Seq(10L), 10L))
  }

  test("state round-trips across batches") {
    val (_, st1) = run(Seq(ins(1, 10), ins(2, 20)))
    val (out2, st2) = run(Seq(del(3, 20), ins(4, 40)), Some(st1))
    assert(out2 === Seq(CellVer(7, 3, 1, 10), CellVer(7, 4, 2, 50)))
    assert(st2 === CellState(Seq(10L, 40L), 50L))
  }

  test("10^4 events in one cell per batch stay linear") {
    val n = 10000
    // grow to n live ids, then delete every third — all in one batch
    val evts = (1 to n).map(i => ins(i.toLong, i.toLong * 3)) ++
      (1 to n / 3).map(i => del((n + i).toLong, i.toLong * 9))
    val t0 = System.nanoTime()
    val (out, st) = run(evts)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.size === evts.size)
    val live = (1 to n).map(_.toLong * 3).toSet --
      (1 to n / 3).map(_.toLong * 9)
    assert(st.ids.toSet === live)
    assert(st.sum === live.sum)
    assert(out.last.n_live === live.size.toLong)
    // the old O(postings^2) path took ~minutes here; linear is millis.
    // 5 s leaves two orders of magnitude of headroom on a noisy host.
    assert(secs < 5.0, f"transition took $secs%.1f s — superlinear?")
  }
}
