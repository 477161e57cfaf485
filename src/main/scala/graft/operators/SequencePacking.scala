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
 *
 * Determinism: the partition count is passed explicitly to
 * `repartitionByRange` so AQE never re-plans the exchange, and the prefix
 * order is derived from each partition's MINIMUM KEY (computed by Spark
 * with the column's own ordering) rather than assuming partition-id order
 * equals key order. A best-effort disjointness invariant turns any layout
 * violation into a loud error instead of a silently shifted cumsum.
 */
object SequencePacking {

  /** `df` plus `bin` (LongType): contiguous weight-packed bin per row.
    * `weightCol` must be non-negative; ties in `orderCol` must not exist
    * (use a unique key). `numPartitions` defaults to the session's
    * shuffle-partition count; it is always passed explicitly to the range
    * exchange so the layout is fixed at plan time. */
  def packBins(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, numPartitions: Option[Int] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(!df.columns.contains("bin"),
      "packBins reserves column name 'bin'; rename it in the input")
    runningSum(df, orderCol, weightCol, "__cum", numPartitions)
      // exact integer floor-division (weights are non-negative by
      // contract): double division would drop low bits past 2^53 total
      // weight and land documents one bin off
      .withColumn("bin",
        expr(s"(__cum - $weightCol) div ${budget}L").cast("long"))
      .drop("__cum")
  }

  /** `df` plus `outCol` (LongType) = the INCLUSIVE running sum of
    * `weightCol` in total `orderCol` order — the distributed prefix-sum
    * device [[packBins]] is built on, exposed for any consumer needing a
    * total-order cumulative (rank statistics, CDF walks). Same contract:
    * unique `orderCol`, explicit partition count, range-disjointness
    * checked loudly. */
  def runningSum(df: DataFrame, orderCol: String, weightCol: String,
      outCol: String, numPartitions: Option[Int] = None): DataFrame = {
    val reservedCols = Seq(outCol, "__pid")
    reservedCols.foreach(c => require(!df.columns.contains(c),
      s"runningSum reserves column name '$c'; rename it in the input"))
    val nParts = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val parted = df
      .repartitionByRange(nParts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin partitioning: the prefix map below is
                             // computed against exactly this layout
    // tiny driver pass: one row per non-empty partition, ordered by the
    // partition's min key — Spark's own ordering, not pid arithmetic
    val stats = parted.groupBy(col("__pid"))
      .agg(min(col(orderCol)).as("__mn"), max(col(orderCol)).as("__mx"),
        sum(col(weightCol)).as("__w"))
      .orderBy(col("__mn"))
      .collect()
    // invariant: partitions must be disjoint key ranges (range exchange
    // contract); the strict < also rejects an equal BOUNDARY key, so
    // cross-partition duplicates fail loudly here — within-partition
    // duplicates fail loudly in the output pass (uniqueGuard below)
    for (i <- 1 until stats.length) {
      safeCompare(stats(i - 1).get(2), stats(i).get(1)).foreach { c =>
        require(c < 0, "runningSum: range partitions overlap — " +
          s"partition ${stats(i - 1).getInt(0)} max=${stats(i - 1).get(2)} " +
          s">= partition ${stats(i).getInt(0)} min=${stats(i).get(1)}")
      }
    }
    val prefix: Map[Int, Long] = stats.zip(
      stats.scanLeft(0L)((acc, r) => acc +
        (if (r.isNullAt(3)) 0L else r.getAs[Number](3).longValue)))
      .map { case (r, pre) => r.getInt(0) -> pre }.toMap
    // O(1) map-literal lookup per row — a CASE WHEN chain over partition
    // ids would be O(P) deep and overflow Catalyst at cluster partition
    // counts, defeating this operator's own scale contract
    val prefixCol: Column =
      if (prefix.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(prefix), col("__pid")), lit(0L))
    // explicit ROWS frame: the default RANGE frame includes peer rows on
    // ties — unreachable given the uniqueness guard below, but the frame
    // states the sequential semantics rather than relying on it
    val localCum = sum(col(weightCol))
      .over(Window.partitionBy(col("__pid")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    parted
      .withColumn(outCol, (localCum + prefixCol).cast("long") +
        uniqueGuard("runningSum", orderCol))
      .drop("__pid")
  }

  /** LOUD within-partition duplicate-orderCol detection that rides the
    * SAME window pass as the local scan (lag shares the (pid, order)
    * window sort — zero extra jobs, zero extra aggregates, unlike a
    * per-partition countDistinct which costs a full second aggregate
    * over the data): evaluates to 0L on every row, throws if a key
    * NULL-SAFE-equals its predecessor. A separate has-predecessor marker
    * (lag of a constant) distinguishes "first row" from "predecessor
    * with a NULL key", so tied NULL keys — which sort adjacent and would
    * make the ROWS-framed scan order-dependent — also fail loudly, and a
    * NULL following a distinct non-NULL key does NOT false-positive.
    * Folded into outCol so Catalyst cannot prune it. Cross-partition
    * duplicates are caught by the strict range-overlap check on the
    * driver stats. */
  private def uniqueGuard(device: String, orderCol: String): Column = {
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val prev = lag(col(orderCol), 1).over(w)
    val hasPrev = lag(lit(1), 1).over(w).isNotNull
    coalesce(assert_true(!(hasPrev && (prev <=> col(orderCol))),
      lit(s"$device: order column '$orderCol' has duplicate (or tied " +
        "NULL) values — use a unique key")).cast("long"), lit(0L))
  }

  /** `df` plus `outCol` (LongType) = the INCLUSIVE running MAX of
    * `valueCol` in total `orderCol` order — [[runningSum]]'s prefix-scan
    * device specialized to max (the watermark primitive: "highest event
    * time seen so far in arrival order"). Same contract: unique
    * `orderCol`, range-disjoint partitions checked loudly, O(partitions)
    * driver prefix pass, never a single-task global window. */
  def runningMax(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numPartitions: Option[Int] = None): DataFrame = {
    val reservedCols = Seq(outCol, "__pid")
    reservedCols.foreach(c => require(!df.columns.contains(c),
      s"runningMax reserves column name '$c'; rename it in the input"))
    val nParts = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val parted = df
      .repartitionByRange(nParts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin layout for the prefix map below
    val stats = parted.groupBy(col("__pid"))
      .agg(min(col(orderCol)).as("__mn"), max(col(orderCol)).as("__mx"),
        max(col(valueCol)).as("__v"))
      .orderBy(col("__mn"))
      .collect()
    // same loud contract as runningSum: strictly disjoint ranges here,
    // within-partition uniqueness via uniqueGuard in the output pass
    for (i <- 1 until stats.length) {
      safeCompare(stats(i - 1).get(2), stats(i).get(1)).foreach { c =>
        require(c < 0, "runningMax: range partitions overlap — " +
          s"partition ${stats(i - 1).getInt(0)} max=${stats(i - 1).get(2)} " +
          s">= partition ${stats(i).getInt(0)} min=${stats(i).get(1)}")
      }
    }
    // prefix(p) = max of all PRECEDING partitions' maxima (MinValue when
    // none) — the scan analogue of runningSum's additive prefix
    val prefix: Map[Int, Long] = stats.zip(
      stats.scanLeft(Long.MinValue)((acc, r) => math.max(acc,
        (if (r.isNullAt(3)) Long.MinValue
         else r.getAs[Number](3).longValue))))
      .map { case (r, pre) => r.getInt(0) -> pre }.toMap
    val prefixCol: Column =
      if (prefix.isEmpty) lit(Long.MinValue)
      else coalesce(element_at(typedLit(prefix), col("__pid")),
        lit(Long.MinValue))
    val localMax = max(col(valueCol))
      .over(Window.partitionBy(col("__pid")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    parted
      .withColumn(outCol, greatest(localMax, prefixCol).cast("long") +
        uniqueGuard("runningMax", orderCol))
      .drop("__pid")
  }

  /** Driver-side ordering check that must never disagree with Spark's
    * column ordering: numbers compare numerically, ASCII strings compare
    * bytewise (== UTF8String order); anything else (non-ASCII strings,
    * exotic types) is skipped rather than risking a false failure. */
  private def safeCompare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Number, y: java.lang.Number)
        if x.isInstanceOf[java.lang.Long] || x.isInstanceOf[Integer] ||
           x.isInstanceOf[java.lang.Short] || x.isInstanceOf[java.lang.Byte] =>
      Some(java.lang.Long.compare(x.longValue, y.longValue))
    case (x: String, y: String)
        if x.forall(_ < 128) && y.forall(_ < 128) =>
      Some(x.compareTo(y))
    case _ => None
  }
}
