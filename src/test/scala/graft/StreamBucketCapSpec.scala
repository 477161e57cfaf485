package graft

import graft.functions.TextFunctions._
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** StreamBucketCap — the hot-bucket arrival-rank cap on the streaming
  * LSH ingest state (`cdc_stream_lsh_ingest` / `cdc_stream_dedup_clusters`
  * stage 1). The default cap binds NOTHING at test scales (asserted
  * here), so this spec FORCES a binding cap and proves three things the
  * correctness gate cannot see:
  *
  *  1. saturation semantics: with cap=1 no bucket ever pairs — the
  *     streaming pair stream is empty;
  *  2. the SQL mirror is exact where it binds: with a small binding cap
  *     the streaming pair set equals the batch-side recomputation of the
  *     oracle's arrival-rank CTE (ROW_NUMBER per band bucket by doc_id),
  *     for both the pair surface and the downstream cluster assignment;
  *  3. the no-bind license: the fixture's hottest band bucket receives
  *     far fewer insertions than the default cap, so default-cap runs
  *     are byte-identical to uncapped ones (the hashes the oracle pins).
  */
class StreamBucketCapSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val CapProp = "graft.dedup.streamBucketCap"

  private def withCap[A](cap: Int)(body: => A): A = {
    System.setProperty(CapProp, cap.toString)
    try body finally System.clearProperty(CapProp)
  }

  private def runIngest(): Set[(Long, Long)] =
    SparkEntry.queries("cdc_stream_lsh_ingest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def runClusters(): Set[(Long, Long)] =
    SparkEntry.queries("cdc_stream_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The replay stream's insert corpus (base docs then late copies) with
    * each doc's cached 16-slot minhash signature. */
  private def insertCorpusSigs(): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
    base.select(col("doc_id"), col("text"))
      .unionByName(base.filter(col("doc_id") % 100 === 1)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
      .select(col("doc_id"),
        minHashSignature(shingleHashes(col("text"), 3), 16).as("sig"))
      .cache()
  }

  /** Batch-side mirror of the capped ingest semantics — the oracle's
    * branks/cands CTEs as DataFrames: insertion rank per band bucket is
    * ROW_NUMBER by doc_id (replay offsets arrive in doc_id order), both
    * pair sides need rank ≤ cap, est ≥ 0.5, and a phase-2-deleted source
    * never pairs with a phase-3 copy. */
  private def cappedPairsMirror(sigs: DataFrame, cap: Int): DataFrame = {
    val brows = sigs.select(col("doc_id"),
      posexplode(bandKeys(col("sig"), 4, 4)).as(Seq("band", "key")))
    val branks = brows.withColumn("rk", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col("doc_id"))))
      .filter(col("rk") <= cap)
    branks.as("a").join(branks.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
        "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
        "id_b")
      .withColumn("m", aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (a, x) => a + x))
      .filter(col("m") >= 8)
      .select(col("id_a"), col("id_b"))
  }

  test("cap=1: every bucket saturates on its first insert — " +
    "the streaming pair stream is empty") {
    val pairs = withCap(1)(runIngest())
    assert(pairs.isEmpty, s"cap=1 must pair nothing, got ${pairs.size}")
  }

  test("binding cap: streaming pair surface equals the oracle's " +
    "arrival-rank mirror, and is a strict subset of the uncapped set") {
    val cap = 2
    val sigs = insertCorpusSigs()
    val mirror = cappedPairsMirror(sigs, cap)
      .filter(!(col("id_b") >= 1000000000L &&
        col("id_a") < 1000000000L && col("id_a") % 13 === 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = withCap(cap)(runIngest())
    assert(streamed === mirror,
      s"only-stream=${streamed -- mirror} only-mirror=${mirror -- streamed}")
    val uncapped = runIngest()
    assert(streamed.subsetOf(uncapped) && streamed.size < uncapped.size,
      s"capped (${streamed.size}) must strictly shrink " +
        s"the uncapped surface (${uncapped.size})")
    sigs.unpersist()
    ()
  }

  test("binding cap: streaming cluster assignment equals the closure " +
    "of the capped mirror pairs over end-of-stream survivors") {
    val cap = 2
    val sigs = insertCorpusSigs()
    val pairs = cappedPairsMirror(sigs, cap)
      .filter(!(col("id_a") < 1000000000L && col("id_a") % 13 === 3))
      .filter(!(col("id_b") < 1000000000L && col("id_b") % 13 === 3))
    val expected = graft.operators.ConnectedComponents
      .components(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = withCap(cap)(runClusters())
    assert(streamed === expected,
      s"only-stream=${streamed -- expected} " +
        s"only-closure=${expected -- streamed}")
    sigs.unpersist()
    ()
  }

  test("no-bind license: the fixture's hottest bucket is far below the " +
    "default cap, so default-cap results are cap-free") {
    val sigs = insertCorpusSigs()
    val maxBucket = sigs
      .select(posexplode(bandKeys(col("sig"), 4, 4)).as(Seq("band", "key")))
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxBucket < DedupQueries.StreamBucketCap,
      s"hottest bucket $maxBucket would bind the default cap " +
        s"${DedupQueries.StreamBucketCap} — resize the cap")
    sigs.unpersist()
    ()
  }
}
