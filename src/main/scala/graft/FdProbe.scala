package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: runs every SparkEntry query N times and reports which ones
  * grow the JVM's open-file-descriptor count, then classifies the still-open
  * descriptors by target path. Run with
  * `sbt 'runMain graft.FdProbe <sfDir> [runsPerQuery] [nameFilter]'`.
  * The bench JVM hit EMFILE (`error=24`) mid-run; this pinpoints the
  * holders without waiting for a full three-pass bench to fall over. */
object FdProbe {
  private def fdCount: Int = {
    val d = new java.io.File("/proc/self/fd").listFiles()
    if (d == null) -1 else d.length
  }

  private def fdTargets: Seq[String] = {
    val dir = new java.io.File("/proc/self/fd")
    val fs = dir.listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.flatMap { f =>
      try Some(java.nio.file.Files.readSymbolicLink(f.toPath).toString)
      catch { case _: Exception => None }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val runs = if (args.length > 1) args(1).toInt else 2
    val filter = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.queries.Fixtures.prepareAll(spark, sfDir)
    catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(n.contains))
    // first pass is warmup (codegen caches, parquet footers etc. open
    // long-lived fds legitimately); measure growth across the LAST runs
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"WARMFAIL $n ${e.getClass.getSimpleName}") }
      spark.catalog.clearCache()
    }
    System.gc(); Thread.sleep(300)
    val base = fdCount
    println(s"BASELINE fds=$base")
    val growth = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    names.foreach { n =>
      val before = fdCount
      var i = 0
      while (i < runs) {
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
        i += 1
      }
      val after = fdCount
      if (after != before) {
        growth += ((n, after - before))
        println(f"GROW  $n%-40s ${after - before}%+d (now $after)")
      }
    }
    System.gc(); Thread.sleep(300)
    println(s"FINAL fds=$fdCount (baseline $base)")
    println("== per-query growth (sorted) ==")
    growth.sortBy(-_._2).foreach { case (n, d) => println(f"$d%+6d  $n") }
    println("== fd target histogram ==")
    fdTargets.groupBy { t =>
      // collapse paths to classes so the histogram is readable
      if (t.contains("temporary-")) "tmp-checkpoint"
      else if (t.contains("/derby") || t.contains("jdbccdc")) "derby"
      else if (t.contains(".scratch")) t.replaceAll("/[^/]*$", "")
        .replaceAll(".*\\.scratch", ".scratch")
      else if (t.contains("blockmgr")) "blockmgr"
      else if (t.startsWith("socket")) "socket"
      else if (t.startsWith("pipe")) "pipe"
      else if (t.startsWith("anon_inode")) "anon_inode"
      else if (t.contains(".jar")) "jar"
      else if (t.contains("testdata")) "testdata-parquet"
      else t.replaceAll("/[^/]*$", "")
    }.toSeq.sortBy(-_._2.size).take(30).foreach { case (k, v) =>
      println(f"${v.size}%6d  $k")
    }
    spark.stop()
  }
}
