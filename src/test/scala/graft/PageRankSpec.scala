package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Integer PageRank: hand-computed fixed point on a tiny graph and
  * bit-identical results across partitionings (exact integer sums). */
class PageRankSpec extends SparkSpecBase {

  import spark.implicits._

  test("hand-computed two-iteration ranks; dangling node keeps base") {
    // 1→2, 1→3, 2→1; node 3 is dangling (contributes nothing)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    def ranks(iters: Int): Map[Long, Long] =
      PageRank.run(edges, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: c(1→·) = 1e9·85/(100·2) = 425000000 each; c(2→1) = 850000000
    assert(ranks(1) === Map(
      1L -> 1000000000L, 2L -> 575000000L, 3L -> 575000000L))
    // iter2: rank1 from 2's new rank 575000000 → 488750000 + base
    assert(ranks(2) === Map(
      1L -> 638750000L, 2L -> 575000000L, 3L -> 575000000L))
  }

  test("bit-identical across partitionings") {
    val edges = (1L to 400L)
      .flatMap(i => Seq((i, i % 37 + 1), (i % 37 + 1, i % 11 + 2)))
      .toDF("src", "dst").distinct()
    def run(parts: Int): Seq[(Long, Long)] =
      PageRank.run(edges.repartition(parts), 4)
        .orderBy(col("node")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === run(13))
  }

  test("barrierEvery: multi-round lazy plans give identical ranks") {
    val edges = (1L to 300L)
      .flatMap(i => Seq((i, i % 23 + 1), (i % 23 + 1, i % 7 + 2)))
      .toDF("src", "dst").distinct()
    def run(be: Int): Seq[(Long, Long)] =
      PageRank.run(edges, 5, barrierEvery = be)
        .orderBy(col("node")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = run(1)
    assert(run(3) === want)
    assert(run(5) === want)
  }

  test("adjacency layout: bit-identical to the edge layout, dangling kept") {
    // includes a dangling node (500 appears only as dst) and skewed degrees
    val edges = ((1L to 400L)
      .flatMap(i => Seq((i, i % 37 + 1), (i % 37 + 1, i % 11 + 2))) :+
      ((7L, 500L))).toDF("src", "dst").distinct().cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgeDeg = edges.join(deg, "src").repartition(col("src")).cache()
    val adj = edges.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("dsts"))
      .withColumn("outdeg", size(col("dsts")).cast("long"))
      .repartition(col("src")).cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().cache()
    for (iters <- Seq(1, 2, 5); be <- Seq(1, 5)) {
      val want = PageRank.runPrepared(edgeDeg, nodes, iters, barrierEvery = be)
        .orderBy(col("node")).collect().map(r => (r.getLong(0), r.getLong(1)))
      val got = PageRank.runAdjacency(adj, nodes, iters, barrierEvery = be)
        .orderBy(col("node")).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got === want, s"iters=$iters barrierEvery=$be")
    }
    // a node with no in-edges holds exactly the base term, and the
    // dangling node (no adjacency row at all) still gets its row
    val r = PageRank.runAdjacency(adj, nodes, 3)
      .filter(col("node").isin(38L, 500L))
      .orderBy(col("node")).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(38L, 500L))
    assert(r.head.getLong(1) === PageRank.Scale * 15 / 100)
  }

  test("reliable checkpoint option: same ranks, durable files written") {
    val edges = (1L to 100L).map(i => (i, i % 17 + 1)).toDF("src", "dst")
      .distinct()
    val want = PageRank.run(edges, 4).orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val got = PageRank.run(edges, 4, reliableEvery = 2)
        .orderBy(col("node")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === want)
      // rounds 2 and 4 must have produced durable checkpoint data
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(files > 0, "no reliable checkpoint files written")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
