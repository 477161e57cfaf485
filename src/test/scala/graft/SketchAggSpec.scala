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
}
