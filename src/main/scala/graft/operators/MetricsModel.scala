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

  /** The exposition line format — ONE definition for every renderer
    * (exposition entry, parse round-trip, the signed-push payload). */
  val LineFormat = """%s{engine="%s",identifier="%s",job="%s"} %.2f"""

  /** Values are snapped to the 2 dp grid BEFORE formatting, with an
    * explicit binary half-up (`floor(x·100 + 0.5)/100` — identical
    * IEEE arithmetic in both engines): the snapped double sits ~1 ulp
    * off an exact 2 dp decimal, so %.2f can never land on a rounding
    * tie and Java's HALF_UP vs C printf's half-even render identical
    * bytes. (Formatting an un-snapped >2 dp value is the one place the
    * two engines' formatters can disagree.) */
  def snappedValue: Column = floor(col("value") * 100 + 0.5) / 100

  /** The identical snap as SQL, for the DuckDB-side renderers. */
  val snappedValueSql = "floor(value * 100 + 0.5) / 100"

  /** Prometheus text-exposition rendering of enriched long rows:
    * `name{engine="…",identifier="…",job="…"} value`. */
  def exposition(df: DataFrame): DataFrame = {
    df.select(format_string(LineFormat,
      col("metric_name"), col("engine"), col("identifier"), col("job"), snappedValue
    ).as("line"))
  }
}
