package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Lineage barrier for iterative DataFrame operators (PageRank, connected
 * components): each round must truncate its plan or driver-side analysis
 * grows exponentially with rounds.
 *
 * Default is `localCheckpoint(eager)` — blocks live only on their
 * executors, which is the fast, right call on `local[*]` but means a lost
 * executor on a real cluster kills the query mid-iteration (no lineage
 * left to recompute). For cluster runs, set a Spark checkpoint dir
 * (`sc.setCheckpointDir`) and pass `reliableEvery = k`: every k-th round
 * writes a RELIABLE checkpoint to that directory instead, bounding the
 * blast radius of an executor loss to at most k rounds of recompute from
 * the last durable snapshot. Both paths preserve the physical plan's
 * output partitioning, so downstream exchange reuse is unaffected.
 */
object IterBarrier {

  /** Cut `df`'s lineage for iteration `round` (1-based). Reliable
    * checkpoints require a configured checkpoint dir; without one the
    * call falls back to a local checkpoint rather than failing. */
  def cut(df: DataFrame, round: Int, reliableEvery: Int): DataFrame =
    if (reliableEvery > 0 && round % reliableEvery == 0 &&
        df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Deferred variant: truncates the LOGICAL plan immediately (the
    * returned frame is already LogicalRDD-backed, so driver-side analysis
    * stays bounded) but materializes the checkpoint blocks as a side
    * effect of the NEXT action instead of launching a dedicated job.
    * Right when every round already ends in a forcing aggregate (the
    * (α,β)-core peel's degree count): the round then costs ONE job, not
    * two, while lineage depth and recompute behavior match [[cut]]. */
  def cutDeferred(df: DataFrame, round: Int, reliableEvery: Int): DataFrame =
    if (reliableEvery > 0 && round % reliableEvery == 0 &&
        df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
