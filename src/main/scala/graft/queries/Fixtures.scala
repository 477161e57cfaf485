package graft.queries

import org.apache.spark.sql.SparkSession

/** One-time fixture materialization for the benchmark's untimed warmup.
  *
  * The CDC queries derive a file-backed changelog database from the base
  * parquet tables on first use (idempotent `_WRITTEN` marker). That write is
  * one-time setup, not query cost — building it here keeps it off whichever
  * CDC query happens to run first in a timed pass.
  */
object Fixtures {
  def prepareAll(spark: SparkSession, sfDir: String): Unit = {
    CdcSourceQueries.prepare(spark, sfDir)
    CdcSourceQueries.prepareDdl(spark, sfDir)
    CdcSourceQueries.prepareJdbc(spark, sfDir)
    CdcSourceQueries.prepareCustomer(spark, sfDir)
    CdcSourceQueries.prepareTenant(spark, sfDir)
    CdcSurfaceQueries.prepareTrunc(spark, sfDir)
    CdcSourceQueries.prepareTyped(spark, sfDir)
    CdcSourceQueries.prepareTz(spark, sfDir)
    CdcSourceQueries.prepareMongo(spark, sfDir)
    CdcSourceQueries.prepareCharset(spark, sfDir)
    CdcSurfaceQueries.prepare(spark, sfDir)
    CdcSurfaceQueries.prepareSharded(spark, sfDir)
    CdcSurfaceQueries.prepareCorrupt(spark, sfDir)
    StreamingQueries.prepare(spark, sfDir)
    PipelineQueries.prepareBucketed(spark, sfDir)
    DedupQueries.prepareDocs(spark, sfDir)
    DedupQueries.prepareDocsReplay(spark, sfDir)
    SimilarityQueries.prepareVecsReplay(spark, sfDir)
    SimilarityQueries.prepareQvecs(spark, sfDir)
    SimilarityQueries.prepareNavGraph(spark, sfDir)
  }
}
