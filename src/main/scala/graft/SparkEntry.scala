package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the named queries (and their DuckDB oracle SQL) from every
  * module: reference-parity analytics first, extension operators as they
  * land. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Analytics.topProducts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Analytics.queries ++
      analytics.EventAnalytics.queries ++
      ext.Dedup.queries ++
      ext.Similarity.queries ++
      ext.TextAnalysis.queries ++
      ext.Sampling.queries ++
      ext.Retrieval.queries ++
      ext.Graph.queries ++
      ext.Spectral.queries ++
      ext.Contamination.queries ++
      ext.SqlSurface.queries ++
      etl.Sources.queries ++
      ops.SnapshotDiff.queries ++
      ops.RangeJoin.queries ++
      ops.GlobalOrder.queries ++
      ops.Skew.queries ++
      ops.ZOrder.queries ++
      ops.ConnectedComponents.queries ++
      streaming.EventStreams.queries ++
      multimodal.Multimodal.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    analytics.Analytics.oracles ++
      analytics.EventAnalytics.oracles ++
      ext.Dedup.oracles ++
      ext.Similarity.oracles ++
      ext.TextAnalysis.oracles ++
      ext.Sampling.oracles ++
      ext.Retrieval.oracles ++
      ext.Graph.oracles ++
      ext.Spectral.oracles ++
      ext.Contamination.oracles ++
      ext.SqlSurface.oracles ++
      etl.Sources.oracles ++
      ops.SnapshotDiff.oracles ++
      ops.RangeJoin.oracles ++
      ops.GlobalOrder.oracles ++
      ops.Skew.oracles ++
      ops.ZOrder.oracles ++
      ops.ConnectedComponents.oracles ++
      streaming.EventStreams.oracles ++
      multimodal.Multimodal.oracles
}
