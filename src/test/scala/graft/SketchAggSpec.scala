package graft

import graft.functions.SketchAggregates.kMinima
import org.apache.spark.sql.functions._

/** KMinimaAgg (bounded-buffer k smallest distinct longs) must equal the
  * sort-based reference formulation on any input, any partitioning. */
class SketchAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("k_minima equals sorted-distinct-take-k under repartitioning") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 7}", rnd.nextLong(1L << 60))
    } ++ Seq.fill(500)(("g0", 12345L)) // heavy duplicate value
    for (parts <- Seq(1, 3, 17)) {
      val df = rows.toDF("g", "h").repartition(parts)
      val got = df.groupBy($"g").agg(kMinima($"h", 8).as("mins"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(8)
      }
      assert(got == want, s"parts=$parts")
    }
  }

  test("graft_k_minima SQL aggregate matches the Column API") {
    graft.functions.GraftExtensions.register(spark)
    val df = (1L to 200L).map(i => (s"g${i % 3}", i * 37 % 101))
      .toDF("g", "h")
    df.createOrReplaceTempView("kmin_in")
    val viaSql = spark.sql(
      "SELECT g, graft_k_minima(h, 5) AS mins FROM kmin_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaCol = df.groupBy($"g").agg(kMinima($"h", 5).as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCol)
    spark.catalog.dropTempView("kmin_in")
  }

  test("k_minima handles groups smaller than k and null inputs") {
    val df = Seq(("a", Some(5L)), ("a", Some(3L)), ("a", None),
      ("b", Some(9L))).toDF("g", "h")
    val got = df.groupBy($"g").agg(kMinima($"h", 4).as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map("a" -> Seq(3L, 5L), "b" -> Seq(9L)))
  }

  test("misra_gries candidate set contains every item with freq > N/(k+1), " +
    "under any partitioning") {
    import graft.functions.SketchAggregates.misraGries
    val rnd = new scala.util.Random(7)
    // skewed stream: a few heavy items over a long random tail
    val heavy = Seq("alpha" -> 900, "beta" -> 500, "gamma" -> 260)
    val rows = heavy.flatMap { case (w, n) => Seq.fill(n)(w) } ++
      (1 to 3000).map(_ => s"t${rnd.nextInt(2000)}")
    val k = 16
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size).toMap
    val mustSurvive = exact.collect {
      case (w, c) if c.toLong * (k + 1) > n => w
    }.toSet
    assert(mustSurvive.nonEmpty) // the test exercises the guarantee
    for (parts <- Seq(1, 4, 23)) {
      val cands = rows.toDF("w").repartition(parts)
        .agg(misraGries($"w", k).as("c"))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts: ${cands.size} > k")
      assert(mustSurvive.subsetOf(cands),
        s"parts=$parts lost ${mustSurvive -- cands}")
    }
  }

  test("misra_gries per-group, null inputs, and k larger than the " +
    "distinct count (exact candidate set)") {
    import graft.functions.SketchAggregates.misraGries
    val df = Seq(("a", Some("x")), ("a", Some("x")), ("a", Some("y")),
      ("a", None), ("b", Some("z"))).toDF("g", "w")
    val got = df.groupBy($"g").agg(misraGries($"w", 8).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // k exceeds the distinct count, so no decrement ever fires: the
    // candidate set is exactly the distinct values, sorted
    assert(got == Map("a" -> Seq("x", "y"), "b" -> Seq("z")))
  }
}
