package graft

import graft.queries.{DedupQueries, InflationProbes}
import org.apache.spark.sql.functions._

/** The BASELINE §4 pipeline-order lesson as an executable property
  * (`dedup_pipeline_exact_winnow`): exact-hash dedup must run BEFORE the
  * winnowed-fingerprint index. The ×16 exact-copy inflation gives every
  * fingerprint df ≥ 16 > WinnowFpCap=8, so the WRONG order (winnow the
  * inflated corpus directly) caps every posting away and emits zero
  * pairs; the composed query's order recovers exactly the pairs of the
  * distinct-text corpus. The oracle pins the same facts numerically —
  * this spec pins them as the ORDER-SENSITIVITY contrast the oracle
  * can't express (it only sees the shipped order).
  */
class PipelineOrderSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def inflated() = InflationProbes.inflate(
    Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")),
    DedupQueries.InflateK, "doc_id")

  test("wrong order: winnow on the inflated corpus caps everything to zero") {
    // every fp's df is a multiple of InflateK=16 > cap 8 → empty index
    assert(DedupQueries.winnowPairsOf(inflated()).count() === 0L)
  }

  test("composed order recovers the distinct-text corpus' pairs exactly") {
    val composed = SparkEntry
      .queries("dedup_pipeline_exact_winnow")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent reference: winnow the distinct-text corpus directly
    // (min doc_id per md5 over the BASE corpus — copies only ever add
    // larger ids, so base-level exact dedup yields the same survivors)
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val survivors = base.groupBy(md5(col("text")).as("h"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.text").as("text"))
    val expected = DedupQueries.winnowPairsOf(survivors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(composed === expected)
    assert(composed.nonEmpty) // the contrast with the wrong order is real
  }
}
