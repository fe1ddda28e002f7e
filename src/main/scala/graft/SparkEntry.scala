package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All operator entries: (name, query, optional DuckDB oracle SQL). */
  private def all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Tpch.entries ++ Tpch2.entries ++ Tpch3.entries ++ Scrapers.entries ++ PromWire.entries ++ PromPush.entries ++ graft.sources.SourceRegistry.entries ++
      graft.sources.Writers.entries ++
      TextAnalysis.entries ++ Dedup.entries ++ Cluster.entries ++ Similarity.entries ++ Multimodal.entries ++
      AsOf.entries ++ Skew.entries ++ Pipeline.entries ++ Reshape.entries ++ Timeseries.entries ++ TimeseriesExt.entries ++ Prune.entries ++
      Sketch.entries ++ Cdc.entries ++ RangeJoin.entries ++ Quality.entries ++ Graph.entries ++ Funnel.entries ++ Cohort.entries ++
      Curation.entries ++ Models.entries ++ Affinity.entries ++ Stats.entries ++ NativeHistogram.entries ++ PromQl.entries ++ Federation.entries ++
      TsdbLifecycle.entries ++ AlertRoute.entries ++ RankStats.entries ++ ScrapePolicy.entries ++ PromApi.entries ++ CurationC4.entries ++ BloomDedup.entries ++ PromQlFns.entries ++ SchemaContract.entries ++ WritePath.entries ++ BinaryQuant.entries ++ TrainPrep.entries ++ IvmQuantile.entries ++
      graft.streaming.EventsStream.entries ++ graft.streaming.LateData.entries ++ graft.streaming.OooStream.entries ++ graft.streaming.AlertStream.entries ++ graft.streaming.DodStream.entries ++ graft.streaming.HllStream.entries ++ graft.streaming.BloomStream.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
