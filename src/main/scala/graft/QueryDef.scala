package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Column names/aliases MUST match between the two. */
case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryUtil {
  /** Scope `spark.sql.shuffle.partitions` around a stateful-streaming
    * query: every state-store instance (one per shuffle partition per
    * stateful operator) pays load/commit overhead each micro-batch, so the
    * partition count should follow state VOLUME. Streaming state here is
    * O(keys-in-flight), far below the batch-join sizing the session default
    * targets; at cluster scale the same knob scales it back up. The
    * previous value is always restored — batch queries are unaffected. */
  def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}

object Tables {
  /** Load one of the driver-generated tables from an sf directory.
    * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for — sessions set spark.sql.legacy.parquet.nanosAsLong and
    * the loader converts to microsecond TimestampType here (`div` keeps the
    * arithmetic in long — a double roundtrip would lose precision above
    * 2^53 ns). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
