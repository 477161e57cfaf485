package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic integer-arithmetic PageRank — the distributed fixed-point
 * iteration companion to [[ConnectedComponents]] (same Pregel-style shape:
 * per-round shuffle of messages to neighbors, lineage truncated by
 * localCheckpoint).
 *
 * All arithmetic is exact BIGINT: ranks are scaled by [[Scale]], each edge
 * carries `floor(rank·85 / (100·outdeg))` (the 0.85 damping as an integer
 * ratio) and the per-node base is `Scale·15/100`. Integer sums commute
 * with any partitioning, so the result is bit-identical to a single-node
 * evaluation — no float summation-order drift, which is what makes the
 * operator oracle-checkable. Dangling nodes (no out-edges) keep only the
 * base term, the standard simplified variant.
 *
 * 100 TB story: each iteration is one ranks⋈edges join on src plus one
 * groupBy(dst) sum — both shuffles keyed by node id, map-side combined;
 * state per round is one (node, rank) row. Fixed iteration count, no
 * driver-side convergence loop over collected data.
 */
object PageRank {

  val Scale = 1000000000L

  /** `edges`: (src LONG, dst LONG), pre-deduplicated. Returns (node, rank)
    * after `iterations` rounds. */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().cache()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgeDeg = e.join(deg, "src").cache()

    var ranks = nodes.select(col("node"), lit(Scale).as("rank"))
      .localCheckpoint(true)
    val base = Scale * 15 / 100
    for (_ <- 1 to iterations) {
      val contribs = ranks
        .join(edgeDeg, ranks("node") === edgeDeg("src"))
        .select(col("dst").as("node"),
          expr(s"(rank * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("m"), lit(0L))).as("rank"))
        .localCheckpoint(true) // truncate the per-round lineage chain
    }
    e.unpersist(); nodes.unpersist(); edgeDeg.unpersist()
    ranks
  }
}
