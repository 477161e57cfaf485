package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sequence packing — assign ordered documents to fixed-budget bins (the
 * "pack documents into training sequences" step of an LLM data pipeline).
 * Contract: documents are taken in `orderCol` order and the bin index is
 * `floor(running_weight_before_doc / budget)` — contiguous packing by
 * cumulative weight, deterministic and independent of partitioning.
 *
 * Scale design: the naive expression — a global `Window.orderBy(...)`
 * cumulative sum — collapses the whole table into ONE task. This operator
 * computes the same total-order cumsum in two phases: range-partition by
 * the order column, cumsum WITHIN each partition (parallel), then add
 * each partition's prefix (the per-partition totals are one tiny
 * driver-side pass, like Spark's own `zipWithIndex`). Output is identical
 * to the single-partition window at any partition count.
 */
object SequencePacking {

  /** `df` plus `bin` (LongType): contiguous weight-packed bin per row.
    * `weightCol` must be non-negative; ties in `orderCol` must not exist
    * (use a unique key). */
  def packBins(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val reservedCols = Seq("bin", "__pid", "__cum")
    reservedCols.foreach(c => require(!df.columns.contains(c),
      s"packBins reserves column name '$c'; rename it in the input"))
    val parted = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin partitioning: the prefix map below is
                             // computed against exactly this layout
    // tiny driver pass: one row per partition → prefix offsets
    val partTotals = parted.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("w"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L
        else r.getAs[Number](1).longValue)).toMap
    val pids = partTotals.keys.toSeq.sorted
    val prefix: Map[Int, Long] = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + partTotals(p))).toMap
    // O(1) map-literal lookup per row — a CASE WHEN chain over partition
    // ids would be O(P) deep and overflow Catalyst at cluster partition
    // counts, defeating this operator's own scale contract
    val prefixCol: Column =
      if (prefix.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(prefix), col("__pid")), lit(0L))
    val localCum = sum(col(weightCol))
      .over(Window.partitionBy(col("__pid")).orderBy(col(orderCol)))
    parted
      .withColumn("__cum", (localCum + prefixCol).cast("long"))
      // exact integer floor-division (weights are non-negative by
      // contract): double division would drop low bits past 2^53 total
      // weight and land documents one bin off
      .withColumn("bin",
        expr(s"(__cum - $weightCol) div ${budget}L").cast("long"))
      .drop("__pid", "__cum")
  }
}
