package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping operators: fixed-width histogram and long→wide pivot —
  * the inverse of the collector surface's wide→long conversion
  * (MetricsModel): a scrape pipeline flattens to long format for
  * remote-write, and the analytics side pivots back to wide for
  * dashboards.
  *
  * Both are single-shuffle aggregations. The pivot names its value
  * list explicitly — at scale that skips Spark's extra distinct-scan
  * job AND fixes the output schema (a streaming/incremental run can't
  * have its columns change under it).
  */
object Reshape {

  type Q = (SparkSession, String) => DataFrame

  val BucketWidth = 50000

  /** Fixed-width histogram of order totals: one aggregation, bucket =
    * floor(price/width) — the linear-scale sibling of the powers-of-2
    * response-time histogram on the collector surface. */
  def histogramTotalprice: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / BucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .withColumn("lo", (col("bucket") * BucketWidth).cast("double"))
      .select("bucket", "lo", "n_orders", "sum_price")
      .orderBy(col("bucket"))
  }

  val histogramTotalpriceSql: String =
    s"""SELECT bucket, CAST(bucket * $BucketWidth AS DOUBLE) AS lo,
          count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        FROM (SELECT CAST(floor(o_totalprice / $BucketWidth) AS BIGINT) AS bucket, o_totalprice
              FROM orders) t
        GROUP BY bucket ORDER BY bucket"""

  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Long→wide pivot: daily value sums per event type as columns. The
    * explicit value list makes this ONE aggregation pass (no distinct
    * pre-scan) with a static schema. */
  def pivotEventsDaily: Q = (s, d) => {
    Tables.events(s, d)
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("value"))
      .groupBy(col("event_date"))
      .pivot("event_type", EventTypes)
      .agg(round(sum(col("value")), 2))
      .orderBy(col("event_date"))
  }

  val pivotEventsDailySql: String = {
    val cols = EventTypes.map(t =>
      s"round(sum(value) FILTER (WHERE event_type = '$t'), 2) AS $t").mkString(",\n          ")
    s"""SELECT CAST(ts AS DATE) AS event_date,
          $cols
        FROM events GROUP BY event_date ORDER BY event_date"""
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_histogram_totalprice", histogramTotalprice, Some(histogramTotalpriceSql)),
    ("q_pivot_events_daily", pivotEventsDaily, Some(pivotEventsDailySql)))
}
