package graft

import graft.operators.SequencePacking

/** Two-phase distributed cumsum packing vs a local sequential reference:
  * identical bins at any partition count. */
class SequencePackingSpec extends SparkSpecBase {

  import spark.implicits._

  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val bin = cum / budget // floor of non-negative division
      cum += w
      id -> bin
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] =
    SequencePacking
      .packBins(rows.toDF("id", "w"), "id", "w", budget)
      .select("id", "bin")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("packing equals the sequential reference on random weights") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    assert(run(rows, 1000L) === reference(rows, 1000L))
  }

  test("oversized documents get their own bin boundary behavior") {
    // a doc larger than the budget still lands by its START offset
    val rows = Seq((1L, 10L), (2L, 5000L), (3L, 10L))
    val got = run(rows, 100L)
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 50L))
  }

  test("single row and empty input") {
    assert(run(Seq((42L, 7L)), 10L) === Map(42L -> 0L))
    assert(run(Seq.empty, 10L) === Map.empty[Long, Long])
  }

  test("explicit partition count overrides the session setting") {
    val rows = (1L to 200L).map(i => (i, (i % 13) + 1))
    val want = reference(rows, 50L)
    for (n <- Seq(1, 3, 32)) {
      val got = SequencePacking
        .packBins(rows.toDF("id", "w"), "id", "w", 50L, Some(n))
        .select("id", "bin")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"numPartitions=$n")
    }
  }

  test("runningSum equals the sequential inclusive cumsum, any partitioning") {
    val rnd = new scala.util.Random(19)
    val rows = (1L to 400L).map(i => (i * 3 - 700, rnd.nextInt(50).toLong))
    var cum = 0L
    val want = rows.sortBy(_._1).map { case (k, w) =>
      cum += w; k -> cum
    }.toMap
    for (n <- Seq(1, 4, 32)) {
      val got = SequencePacking
        .runningSum(rows.toDF("k", "w"), "k", "w", "cum", Some(n))
        .select("k", "cum")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"numPartitions=$n")
    }
  }

  test("runningSum rejects reserved output column collisions") {
    val df = Seq((1L, 2L)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SequencePacking.runningSum(df, "k", "w", "w")
    }
  }

  test("duplicate order keys fail LOUDLY (uniqueGuard), not silently") {
    // duplicate inside one partition: the per-row lag guard must throw
    // when the output is materialized (the contract the ROWS-framed
    // cumsum depends on)
    val dup = Seq((1L, 2L), (5L, 3L), (5L, 4L), (9L, 1L)).toDF("k", "w")
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val ex = intercept[Exception] {
      SequencePacking.runningSum(dup, "k", "w", "cum", Some(1)).collect()
    }
    assert(chainMsg(ex).contains("duplicate"), chainMsg(ex))
    val ex2 = intercept[Exception] {
      SequencePacking.runningMax(dup, "k", "w", "wm", Some(1)).collect()
    }
    assert(chainMsg(ex2).contains("duplicate"), chainMsg(ex2))
  }

  test("runningMax equals the sequential inclusive running max, any " +
    "partitioning — including negative values and a descending tail") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 400L).map(i =>
      (i * 3 - 700, rnd.nextInt(1000).toLong - 500L))
    var mx = Long.MinValue
    val want = rows.sortBy(_._1).map { case (k, v) =>
      mx = math.max(mx, v); k -> mx
    }.toMap
    for (n <- Seq(1, 4, 32)) {
      val got = SequencePacking
        .runningMax(rows.toDF("k", "v"), "k", "v", "wm", Some(n))
        .select("k", "wm")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"numPartitions=$n")
    }
  }

  test("runningMax rejects reserved output column collisions") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SequencePacking.runningMax(df, "k", "v", "v")
    }
  }

  test("dirty session: repeated runs under cache pressure are identical") {
    // mirrors the driver's 140-query single-JVM session: storage-memory
    // churn + a changed shuffle-partition setting between runs must not
    // perturb the bins, and the distributed cumsum must tie out to the
    // scalar total each time
    val rnd = new scala.util.Random(11)
    val rows = (1L to 800L).map(i => (i, 1L + rnd.nextInt(500).toLong))
    val df = rows.toDF("id", "w")
    val total = rows.map(_._2).sum
    val want = reference(rows, 777L)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for ((parts, round) <- Seq("32", "5", "32", "17").zipWithIndex) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        // cache pressure: materialize and drop a mid-sized cached table
        val noise = spark.range(0, 200000).selectExpr("id",
          "repeat('x', 64) AS pad").cache()
        noise.count()
        val packed = SequencePacking.packBins(df, "id", "w", 777L)
        val got = packed.select("id", "bin")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"round=$round parts=$parts")
        // cumsum invariant: per-bin weights must sum to the scalar total
        val binTotal = packed.agg(org.apache.spark.sql.functions.sum("w"))
          .head().getLong(0)
        assert(binTotal === total, s"round=$round cum total drift")
        noise.unpersist(blocking = true)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }
}
