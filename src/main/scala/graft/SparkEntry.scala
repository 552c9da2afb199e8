package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (name → plan
  * builder) and an `oracles` map (name → DuckDB-equivalent SQL). Column
  * names and ordering are aligned on both sides so the driver's
  * column-sorted value-hash compare matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreAnalytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreAnalytics.queries, CoreAnalytics.oracles),
      (EtlCleaning.queries, EtlCleaning.oracles),
      (EtlMatching.queries, EtlMatching.oracles),
      (EtlEnrichment.queries, EtlEnrichment.oracles),
      (EtlTemplates.queries, EtlTemplates.oracles),
      (EtlScheduling.queries, EtlScheduling.oracles),
      (Dedup.queries, Dedup.oracles),
      (GraphOps.queries, GraphOps.oracles),
      (CorpusOps.queries, CorpusOps.oracles),
      (AnnSearch.queries, AnnSearch.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Events.queries, Events.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Incremental.queries, Incremental.oracles),
      (DataQuality.queries, DataQuality.oracles),
      (SqlSurface.queries, SqlSurface.oracles),
      (MaintQueries.queries, MaintQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
