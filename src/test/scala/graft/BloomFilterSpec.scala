package graft

import graft.functions.{BloomFunctions, BloomUtil}
import org.apache.spark.sql.functions._

/** Bloom aggregate + membership probe: no false negatives, bounded false
  * positives, OR-merge distributivity across partitionings, SQL surface. */
class BloomFilterSpec extends SparkSpecBase {

  import spark.implicits._

  test("no false negatives; FP rate near theory; partition-independent") {
    val n = 2000
    val numBits = 1 << 15 // m/n = 16.4, k=3 → theoretical FP ~ 0.6%
    val members = (0 until n).map(i => i.toLong * 7 + 1)
    val bits = members.toDF("v").repartition(8)
      .agg(BloomFunctions.bloomAgg(col("v"), numBits, 3))
      .head().getAs[Array[Byte]](0)

    assert(members.forall(BloomUtil.contains(bits, _, 3)), "false negative")

    val probes = (1000000L until 1020000L)
    val fp = probes.count(BloomUtil.contains(bits, _, 3))
    assert(fp.toDouble / probes.size < 0.02, s"FP rate too high: $fp/20000")

    // same members through a different partitioning → identical bits
    // (merge = OR is associative+commutative)
    val bits2 = members.toDF("v").repartition(3)
      .agg(BloomFunctions.bloomAgg(col("v"), numBits, 3))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bits, bits2))
  }

  test("SQL surface: graft_bloom_agg / graft_bloom_contains") {
    graft.functions.GraftExtensions.register(spark)
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("bloom_in")
    val bits = spark.sql(
      "SELECT graft_bloom_agg(v, 4096, 3) FROM bloom_in")
      .head().getAs[Array[Byte]](0)
    Seq((1L, bits), (999999L, bits)).toDF("v", "b")
      .createOrReplaceTempView("bloom_probe")
    val got = spark.sql(
      "SELECT v, graft_bloom_contains(b, v, 3) FROM bloom_probe ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got(0) === (1L, true))
    // 999999 overwhelmingly likely absent from a 4096-bit filter of 3 keys
    assert(got(1) === (999999L, false))
    spark.catalog.dropTempView("bloom_in")
    spark.catalog.dropTempView("bloom_probe")
  }

  test("HLL registers: estimate within 15% at 10k distinct") {
    import graft.functions.TextFunctions.md5Long
    import graft.queries.PipelineQueries.smearExpr
    val denom = (1 to 10000).map(i => s"user_$i").toDF("u")
      .select(md5Long(col("u")).as("h"))
      .select(expr("h & 63").as("bucket"), expr("h >> 6").as("w"))
      .select(col("bucket"),
        expr(s"55 - bit_count(${smearExpr("w")})").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
      .agg(sum(expr("CAST(1 AS BIGINT) << (55 - register)")).as("d"))
      .head().getLong(0)
    val est = 0.709 * 4096.0 * math.pow(2.0, 55) / denom.toDouble
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est")
  }
}
