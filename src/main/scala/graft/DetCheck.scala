// scratch determinism harness (not part of the library)
package graft

import org.apache.spark.sql.SparkSession

import java.security.MessageDigest
import java.util.concurrent.{Executors, TimeUnit}

/** Stress a query for run-to-run determinism inside one dirty JVM session:
  * repeated executions under storage-memory churn, changed shuffle-partition
  * settings, and CONCURRENT jobs on other threads (the driver's verify pass
  * is single-threaded, but task threads interleave under local[32]). Prints
  * the canonical result hash per run and fails loudly on any drift. Run:
  * `sbt 'runMain graft.DetCheck <name> <sfDir> [runs]'`. */
object DetCheck {
  private def canonHash(rows: Array[org.apache.spark.sql.Row]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    rows.map(_.toString).sorted.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val pool = Executors.newFixedThreadPool(4)
    @volatile var stopNoise = false
    // background churn: shuffles + caches competing for storage/exec memory
    (1 to 3).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = while (!stopNoise) {
          try {
            val d = spark.range(0, 400000)
              .selectExpr("id", s"repeat('n$t', 48) AS pad", "id % 97 AS k")
            val c = d.cache(); c.count()
            c.groupBy("k").count().count()
            c.unpersist(blocking = false)
          } catch { case _: Throwable => () }
        }
      })
    }
    var ref: String = null
    var bad = 0
    val parts = Iterator.continually(Seq("32", "7", "32", "13", "32")).flatten
    for (i <- 1 to runs) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.next())
      val rows = fn(spark, sfDir).collect()
      val h = canonHash(rows)
      if (ref == null) ref = h
      val ok = h == ref
      if (!ok) bad += 1
      println(s"DETCHECK $name run=$i rows=${rows.length} hash=${h.take(16)} " +
        (if (ok) "OK" else "MISMATCH"))
      spark.catalog.clearCache()
    }
    stopNoise = true
    pool.shutdownNow(); pool.awaitTermination(10, TimeUnit.SECONDS)
    println(s"DETCHECK $name total=$runs mismatches=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
