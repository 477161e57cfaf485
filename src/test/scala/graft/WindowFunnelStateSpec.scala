package graft

import graft.queries.StreamingQueries.{funnelStep, FunnelState}
import org.scalatest.funsuite.AnyFunSuite

/** The windowed-funnel state machine's micro-batch contract: threading
  * the state through ANY split of a user's (event-time-ordered) stream
  * must equal one pass — batch boundaries cannot change the funnel.
  * Also pins the machine against a brute-force windowFunnel reference
  * (enumerate all view<click<purchase chains within W of the anchor). */
class WindowFunnelStateSpec extends AnyFunSuite {

  private val W = 100L

  /** Brute-force ClickHouse-windowFunnel reference: deepest chain
    * v < c < p (strict ROW order on (tse, eid)) with p.tse <= v.tse + W
    * and, for stage 2, c.tse <= v.tse + W. */
  private def reference(evs: Seq[(String, Long, Long)]): Int = {
    val ord = evs.sortBy { case (_, eid, tse) => (tse, eid) }
    val n = ord.length
    var stage = 0
    for (i <- 0 until n if ord(i)._1 == "view") {
      stage = math.max(stage, 1)
      for (j <- i + 1 until n if ord(j)._1 == "click" &&
          ord(j)._3 <= ord(i)._3 + W) {
        stage = math.max(stage, 2)
        for (k <- j + 1 until n if ord(k)._1 == "purchase" &&
            ord(k)._3 <= ord(i)._3 + W)
          stage = 3
      }
    }
    stage
  }

  private def randomEvents(rnd: scala.util.Random, n: Int)
      : Seq[(String, Long, Long)] = {
    val types = Array("view", "click", "purchase", "error", "signup")
    (1 to n).map { i =>
      (types(rnd.nextInt(types.length)), i.toLong,
        rnd.nextInt(300).toLong)
    }
  }

  test("single pass matches the brute-force windowFunnel reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val evs = randomEvents(rnd, 1 + rnd.nextInt(20))
      val got = funnelStep(FunnelState.empty, evs, W).stage
      val want = reference(evs)
      assert(got == want, s"trial $trial: evs=$evs got=$got want=$want")
    }
  }

  test("batch-boundary invariance: any event-time-ordered split threads " +
    "to the same final stage") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 100) {
      val evs = randomEvents(rnd, 2 + rnd.nextInt(18))
        .sortBy { case (_, eid, tse) => (tse, eid) }
      val whole = funnelStep(FunnelState.empty, evs, W)
      for (cut <- 1 until evs.length) {
        val (a, b) = evs.splitAt(cut)
        val threaded = funnelStep(funnelStep(FunnelState.empty, a, W), b, W)
        assert(threaded == whole,
          s"trial $trial cut $cut: $threaded != $whole for $evs")
      }
      // three-way splits too — the state is a true left fold
      if (evs.length >= 3) {
        val third = evs.length / 3
        val s3 = funnelStep(funnelStep(funnelStep(FunnelState.empty,
          evs.take(third), W), evs.slice(third, 2 * third), W),
          evs.drop(2 * third), W)
        assert(s3 == whole)
      }
    }
  }

  test("stage is monotone across batches (update-mode emissions only " +
    "ever grow)") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 50) {
      val evs = randomEvents(rnd, 12)
        .sortBy { case (_, eid, tse) => (tse, eid) }
      var fs = FunnelState.empty
      var last = 0
      evs.grouped(3).foreach { b =>
        fs = funnelStep(fs, b, W)
        assert(fs.stage >= last)
        last = fs.stage
      }
    }
  }
}
