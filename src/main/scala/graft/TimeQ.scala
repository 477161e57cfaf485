// scratch timing harness (not part of the library)
package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; i <- 1 to (if (sys.env.contains("TIMEQ_RUNS")) sys.env("TIMEQ_RUNS").toInt else 2)) {
      // TIMEQ_CLEAR=1 → bench semantics: JIT stays warm, caches go cold
      if (sys.env.get("TIMEQ_CLEAR").contains("1")) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIME $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
