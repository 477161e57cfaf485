package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic integer-arithmetic PageRank — the distributed fixed-point
 * iteration companion to [[ConnectedComponents]] (same Pregel-style shape:
 * per-round shuffle of messages to neighbors, lineage truncated per round
 * via [[IterBarrier]]).
 *
 * All arithmetic is exact BIGINT: ranks are scaled by [[Scale]], each edge
 * carries `floor(rank·85 / (100·outdeg))` (the 0.85 damping as an integer
 * ratio) and the per-node base is `Scale·15/100`. Integer sums commute
 * with any partitioning, so the result is bit-identical to a single-node
 * evaluation — no float summation-order drift, which is what makes the
 * operator oracle-checkable. Dangling nodes (no out-edges) keep only the
 * base term, the standard simplified variant.
 *
 * 100 TB story — ONE exchange per iteration: `edgeDeg` is persisted
 * pre-partitioned on `src`, and the per-round `groupBy(node)` aggregate
 * leaves `ranks` hash-partitioned on `node` (the barrier preserves output
 * partitioning), so the next round's ranks⋈edgeDeg join reuses both
 * layouts with no new shuffle. Dangling-node handling is NOT a second
 * join: a cached zero-contribution row per node rides the union into the
 * same aggregate. State per round is one (node, rank) row; fixed
 * iteration count, no driver-side convergence loop over collected data.
 */
object PageRank {

  val Scale = 1000000000L

  /** `edges`: (src LONG, dst LONG), pre-deduplicated. Returns (node, rank)
    * after `iterations` rounds. `reliableEvery` > 0 swaps every k-th
    * barrier's local checkpoint for a reliable one (see [[IterBarrier]]).
    * `barrierEvery` sets how many rounds run inside ONE lazy plan before
    * a lineage cut: unlike star-contraction, a PageRank round references
    * the previous ranks exactly once, so the plan grows LINEARLY with
    * rounds and a handful of rounds per job is pure win (one job launch
    * + one materialization instead of k); cut periodically so planning
    * time and recovery lineage stay bounded on long runs. */
  def run(edges: DataFrame, iterations: Int,
      reliableEvery: Int = 0, barrierEvery: Int = 1): DataFrame = {
    val e = edges.select(col("src"), col("dst")).cache()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // persisted hash-partitioned on the join key: every round's
    // ranks⋈edgeDeg reads this layout as-is, zero per-round edge shuffles
    val edgeDeg = e.join(deg, "src").repartition(col("src")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().cache()
    val out = runPrepared(edgeDeg, nodes, iterations, reliableEvery,
      barrierEvery)
    e.unpersist(); nodes.unpersist(); edgeDeg.unpersist()
    out
  }

  /** Iteration core over a PRE-BUILT graph: `edgeDeg` = (src, dst, outdeg)
    * persisted hash-partitioned on `src`, `nodes` = every node id once.
    * Callers that already paid a degree pass (or share the graph with
    * another operator) skip [[run]]'s rebuild; caches stay caller-owned.
    * `cutFinal=false` skips the LAST round's eager checkpoint — safe only
    * when the caller consumes the result exactly once while the input
    * caches are still alive ([[run]] must keep it: it unpersists the
    * inputs before the returned plan ever executes). */
  /** Iteration core over an ADJACENCY-LIST graph: `adj` = (src,
    * dsts ARRAY<LONG>, outdeg) persisted hash-partitioned on `src`, one
    * row per source node. Identical arithmetic to [[runPrepared]] —
    * each (src, dst) edge still contributes `floor(rank·85/(100·outdeg))`
    * — but the per-round join touches |V| adjacency rows instead of |E|
    * edge rows: the fan-out happens as an in-task `explode` feeding the
    * map-side partial aggregate, so the round's only |E|-sized flow never
    * sorts or shuffles (the message shuffle carries the per-partition
    * combined partials, |V|-bounded). This is the vertex-cut trade every
    * adjacency-layout graph engine makes: a pathological super-node's
    * dsts array is one row — at 100 TB scale, segment high-degree
    * adjacency rows into bounded slices (each slice keeps the full
    * outdeg, so arithmetic is unchanged) or fall back to the
    * edge-partitioned [[runPrepared]]. */
  def runAdjacency(adj: DataFrame, nodes: DataFrame, iterations: Int,
      reliableEvery: Int = 0, barrierEvery: Int = 1,
      cutFinal: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val zero = nodes.select(col("node"), lit(0L).as("c"))
    val base = Scale * 15 / 100
    val cutEvery = math.max(1, barrierEvery)
    var ranks: DataFrame = null
    for (i <- 1 to iterations) {
      // round 1: uniform ranks make messages a pure map over adj
      val msgs = if (i == 1)
        adj.select(explode(col("dsts")).as("node"),
          expr(s"(${Scale}L * 85) div (100 * outdeg)").as("c"))
      else ranks
        .join(adj, ranks("node") === adj("src"))
        // column order matters: the union with `zero` below is positional
        .select(explode(col("dsts")).as("node"),
          expr(s"(rank * 85) div (100 * outdeg)").as("c"))
      val next = msgs.union(zero)
        .groupBy(col("node"))
        .agg((lit(base) + sum(col("c"))).as("rank"))
      ranks = if ((i % cutEvery == 0 || i == iterations)
          && (cutFinal || i != iterations))
        IterBarrier.cut(next, i, reliableEvery)
      else next
    }
    ranks
  }

  def runPrepared(edgeDeg: DataFrame, nodes: DataFrame, iterations: Int,
      reliableEvery: Int = 0, barrierEvery: Int = 1,
      cutFinal: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // one zero message per node: makes the aggregate itself produce every
    // node's row (dangling included) — replaces the former per-round
    // nodes⋈contribs left join and its extra exchange
    val zero = nodes.select(col("node"), lit(0L).as("c"))

    val base = Scale * 15 / 100
    val cutEvery = math.max(1, barrierEvery)
    var ranks: DataFrame = null
    for (i <- 1 to iterations) {
      // round 1's ranks are uniformly Scale, so its messages are a PURE
      // MAP over edgeDeg — the first ranks⋈edges join (and the initial
      // ranks materialization) never exists; identical arithmetic
      val msgs = if (i == 1)
        edgeDeg.select(col("dst").as("node"),
          expr(s"(${Scale}L * 85) div (100 * outdeg)").as("c"))
      else ranks
        .join(edgeDeg, ranks("node") === edgeDeg("src"))
        .select(col("dst").as("node"),
          expr(s"(rank * 85) div (100 * outdeg)").as("c"))
      val next = msgs.union(zero)
        .groupBy(col("node"))
        .agg((lit(base) + sum(col("c"))).as("rank"))
      // cut on the period (and always before unpersisting the inputs the
      // final plan would otherwise still reference)
      ranks = if ((i % cutEvery == 0 || i == iterations)
          && (cutFinal || i != iterations))
        IterBarrier.cut(next, i, reliableEvery)
      else next
    }
    ranks
  }
}
