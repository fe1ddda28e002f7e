package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's metric long format and the remote-write reshaping.
  *
  * Mirrors the semantics of the reference's
  * `ConvertMetricFamilyToTimeSeries`
  * (collector/internal/utils/prometheus.go:23-120): each metric row is
  * flattened to `(__name__, labels…, value)` and enriched with
  * `identifier` (host split on '.'), `job`, `region`, `accountId`,
  * `engine` labels. Spark-first: the wide→long transform is a
  * codegen'd `stack`, enrichment is constant columns — no UDFs, fully
  * whole-stage-codegen, scales linearly with input rows.
  */
object MetricsModel {

  /** Unpivot wide metric columns into (metric_name, value) long rows.
    * All metric columns must be (castable to) double. */
  def wideToLong(df: DataFrame, idCols: Seq[String], metricCols: Seq[String]): DataFrame = {
    val stackArgs = metricCols
      .map(m => s"'$m', cast(`$m` as double)")
      .mkString(", ")
    df.selectExpr(
      idCols.map(c => s"`$c`") :+
        s"stack(${metricCols.size}, $stackArgs) as (metric_name, value)": _*)
  }

  /** Label enrichment as done by the reference's remote-write path:
    * identifier = host up to the first '.', plus job/region/account/engine. */
  def enrichLabels(df: DataFrame, host: Column, engine: String,
      region: String = "us-east-1", accountId: String = "123456789012",
      job: String = "database-collector"): DataFrame = {
    df.withColumn("identifier", split(host, "\\.").getItem(0))
      .withColumn("job", lit(job))
      .withColumn("region", lit(region))
      .withColumn("account_id", lit(accountId))
      .withColumn("engine", lit(engine))
  }

  /** Prometheus text-exposition rendering of enriched long rows:
    * `name{engine="…",identifier="…",job="…"} value`. */
  def exposition(df: DataFrame): DataFrame = {
    df.select(format_string(
      """%s{engine="%s",identifier="%s",job="%s"} %.2f""",
      col("metric_name"), col("engine"), col("identifier"), col("job"), col("value")
    ).as("line"))
  }
}
