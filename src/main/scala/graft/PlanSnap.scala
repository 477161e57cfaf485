// scratch tool (not part of the library): dump explain("formatted") for
// named queries to per-query files — the plans/r12/<q>_before|after.txt
// evidence the optimization rounds require. Executes each query first so
// the AQE-finalized plan is what gets recorded.
package graft
import org.apache.spark.sql.SparkSession
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",")
    val suffix = if (args.length > 2) args(2) else ""
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"), txt)
      println(s"PLAN_WRITTEN=$outDir/$n$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
