package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Distributed connected components over an edge list — the pairs→clusters
 * step of a near-duplicate pipeline (LSH emits duplicate PAIRS; keeping one
 * document per duplicate GROUP needs the transitive closure).
 *
 * Algorithm: alternating large-star / small-star contractions
 * (Kiveris et al., "Connected Components in MapReduce and Beyond",
 * SoCC'14). Each round is two shuffles (a groupBy-min and a join per
 * phase); the edge set converges to stars centered at each component's
 * minimum node id in O(log² n) rounds — independent of component DIAMETER,
 * which is what breaks naive label propagation at corpus scale (a chain of
 * n near-identical crawl snapshots needs n propagation rounds but only
 * ~log n star rounds).
 *
 * Scale notes: no collect_list — per-node neighbor minima come from a
 * groupBy(min) joined back, so a hub node of any degree never materializes
 * its neighborhood in one task. Each round materializes its edge set with
 * localCheckpoint — persist alone is NOT enough for an iterative
 * DataFrame: the logical plan references the previous round's plan
 * several times per round, so the analyzed TREE (and driver-side analysis
 * time) grows exponentially with rounds unless the lineage is truncated.
 * Everything is min-based, so the result is deterministic under any
 * partitioning.
 */
object ConnectedComponents {

  /** Component id (= minimum member id) for every node that appears in
    * `edges`. Input: two integral columns; treated as undirected, self
    * loops and duplicates are fine. Output: (`id`, `component`).
    * `reliableEvery` > 0 swaps every k-th round's local checkpoint for a
    * reliable one (see [[IterBarrier]] — cluster durability). */
  def components(edges: DataFrame, src: String, dst: String,
      maxRounds: Int = 50, reliableEvery: Int = 0): DataFrame = {
    val u = col("u"); val v = col("v")
    // localCheckpoint (eager) cuts the plan to a leaf each round — see the
    // scale note above; `persist` alone leaves an exponentially growing
    // analyzed tree
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(u =!= v)
      .select(greatest(u, v).as("u"), least(u, v).as("v"))
      .distinct()
      .localCheckpoint(true)
    var sig = checksum(e)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = IterBarrier.cut(smallStar(largeStar(e)), round + 1,
        reliableEvery)
      val nextSig = checksum(next)
      // checksum equality is necessary, not sufficient — confirm the fixed
      // point exactly (cheap: runs once, on the already-materialized sets)
      converged = nextSig == sig &&
        next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e.unpersist()
      e = next
      sig = nextSig
      round += 1
    }
    require(converged, s"connected components did not converge in " +
      s"$maxRounds rounds (pathological input or maxRounds too low)")
    // converged edges are stars (child, root); roots map to themselves.
    // e stays checkpointed — the result reads it (a truncated plan has no
    // lineage to recompute from once unpersisted).
    e.select(u.as("id"), v.as("component"))
      .unionByName(e.select(v.as("id"), v.as("component")))
      .distinct()
  }

  /** large-star: every node attaches its LARGER neighbors to the minimum
    * of its neighborhood (including itself). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: every node attaches its smaller-or-equal neighbors (and
    * itself) to the minimum of that set. Input/output edges are oriented
    * (u > v). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val mins = or.groupBy("u").agg(min("v").as("mn")) // mn < u by orientation
    val attach = or.join(mins, "u")
      .filter(col("v") =!= col("mn"))
      .select(col("v").as("u"), col("mn").as("v"))
    attach.unionByName(mins.select(col("u"), col("mn").as("v")))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Cheap order-insensitive fingerprint of an edge set: count + two
    * independent sums. Equality gates the exact fixed-point check. */
  private def checksum(e: DataFrame): (Long, Long, Long) = {
    val r = e.agg(
      count(lit(1)),
      sum(hashCol(col("u"), col("v"))),
      sum(col("u") * 37L + col("v"))).collect()(0)
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  private def hashCol(cs: Column*): Column = hash(cs: _*).cast("long")
}
