package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-domain registries; every entry with an
  * oracle is hash-compared against DuckDB on the same parquet tables. */
object SparkEntry {

  private def all: Map[String, QueryDef] =
    queries_registry

  private lazy val queries_registry: Map[String, QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.TpchQueries.defs ++
      graft.queries.AdvancedQueries.defs ++
      graft.queries.CdcQueries.defs ++
      graft.queries.CdcSourceQueries.defs ++
      graft.queries.CdcSurfaceQueries.defs ++
      graft.queries.StreamingQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.CurationQueries.defs ++
      graft.queries.CorpusQueries.defs ++
      graft.queries.GovernanceQueries.defs ++
      graft.queries.DataQualityQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("cdc_agg_after_changes").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
