package graft

import graft.operators.SequencePacking

/** Two-phase distributed cumsum packing vs a local sequential reference:
  * identical bins at any partition count. */
class SequencePackingSpec extends SparkSpecBase {

  import spark.implicits._

  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val bin = cum / budget // floor of non-negative division
      cum += w
      id -> bin
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] =
    SequencePacking
      .packBins(rows.toDF("id", "w"), "id", "w", budget)
      .select("id", "bin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("packing equals the sequential reference on random weights") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    assert(run(rows, 1000L) === reference(rows, 1000L))
  }

  test("oversized documents get their own bin boundary behavior") {
    // a doc larger than the budget still lands by its START offset
    val rows = Seq((1L, 10L), (2L, 5000L), (3L, 10L))
    val got = run(rows, 100L)
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 50L))
  }

  test("single row and empty input") {
    assert(run(Seq((42L, 7L)), 10L) === Map(42L -> 0L))
    assert(run(Seq.empty, 10L) === Map.empty[Long, Long])
  }
}
