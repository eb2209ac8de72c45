package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every operator claimed done in
  * SURVEY.md §2 has an entry in [[queries]]; SQL-expressible ones also have a
  * DuckDB oracle in [[oracleSql]] (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.queries("q05_broadcast_dims")(
      spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (operators.CoreQueries.queries, operators.CoreQueries.oracleSql),
    (operators.ReferenceQueries.queries, operators.ReferenceQueries.oracleSql),
    (operators.PipelineQueries.queries, operators.PipelineQueries.oracleSql),
    (operators.StreamCatalogQueries.queries,
      operators.StreamCatalogQueries.oracleSql),
    (operators.SystemQueries.queries, operators.SystemQueries.oracleSql),
    (operators.ExtendedQueries.queries, operators.ExtendedQueries.oracleSql),
    (operators.FrontierQueries.queries, operators.FrontierQueries.oracleSql),
    (operators.ScaleQueries.queries, operators.ScaleQueries.oracleSql),
    (operators.IncrementalQueries.queries, operators.IncrementalQueries.oracleSql),
    (operators.AnalyticsQueries.queries, operators.AnalyticsQueries.oracleSql),
    (operators.QualityQueries.queries, operators.QualityQueries.oracleSql),
    (operators.CorpusQueries.queries, operators.CorpusQueries.oracleSql),
    (operators.CalibrationQueries.queries,
      operators.CalibrationQueries.oracleSql),
    (operators.StorageQueries.queries, operators.StorageQueries.oracleSql),
    (operators.WebCurationQueries.queries,
      operators.WebCurationQueries.oracleSql),
    (operators.GraphQueries.queries, operators.GraphQueries.oracleSql),
    (operators.StatsQueries.queries, operators.StatsQueries.oracleSql),
    (operators.VideoQueries.queries, operators.VideoQueries.oracleSql),
    (operators.SpanQueries.queries, operators.SpanQueries.oracleSql),
    (operators.AnomalyQueries.queries, operators.AnomalyQueries.oracleSql),
    (operators.CompareQueries.queries, operators.CompareQueries.oracleSql),
    (operators.DesignQueries.queries, operators.DesignQueries.oracleSql)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
