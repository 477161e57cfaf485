package graft

import graft.operators.ConnectedComponents

/** Star-contraction connected components vs a local union-find reference:
  * exact agreement on random graphs, plus the shapes that break naive
  * approaches (long chains — diameter >> rounds; hubs; singleton edges). */
class ConnectedComponentsSpec extends SparkSpecBase {

  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical root = min member, which union-by-min guarantees
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain: component converges to the minimum despite large diameter") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    assert(run(chain) === (1L to 40L).map(_ -> 1L).toMap)
  }

  test("two components, hub, self-loops and duplicate edges") {
    val edges = Seq((10L, 2L), (2L, 7L), (7L, 7L), (10L, 2L),
      (100L, 101L), (101L, 102L), (100L, 102L))
    assert(run(edges) === Map(2L -> 2L, 7L -> 2L, 10L -> 2L,
      100L -> 100L, 101L -> 100L, 102L -> 100L))
  }

  test("random graphs agree with union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 5 + rnd.nextInt(60)
      val m = 1 + rnd.nextInt(120)
      val es = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (es.nonEmpty)
        assert(run(es) === unionFind(es), s"trial $trial n=$n m=$m")
    }
  }

  test("reliable checkpoint option: identical components") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 5L), (7L, 8L))
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val got = graft.operators.ConnectedComponents
        .components(es.toDF("a", "b"), "a", "b", reliableEvery = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(es))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
