package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of TSDB read-side operators: time-weighted averages
  * (the billing/utilization read), robust MAD-based outlier detection
  * (the alerting read that survives non-Gaussian series), and PromQL
  * subqueries (`max_over_time(rate(m[10m])[1h:10m])` — rate-of-rates
  * composition). Companions to `Timeseries`' rate/downsample/gap-fill
  * block; same scale shape: everything is keyed by series, one shuffle
  * on the series key, bounded window frames.
  *
  * Float parity playbook (see `Timeseries.anomalyZscore`'s history):
  * sample values enter as exact integer cents (`floor(value*100)` —
  * one IEEE multiply + floor, identical cross-engine), all sums and
  * moments stay in BIGINT, and each output makes at most ONE floored
  * division at the end.
  */
object TimeseriesExt {

  type Q = (SparkSession, String) => DataFrame

  /** Samples with exact integer-cent values and second-resolution
    * epoch — the engine-exact sample representation. */
  private def samples(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_type"), col("ts"), col("event_id"),
      floor(col("value") * 100).cast("long").as("v_c"),
      unix_timestamp(date_trunc("second", col("ts"))).as("sec"))

  // --------------------------------------------- time-weighted average

  /** Time-weighted average per (series, day) — the utilization /
    * billing aggregate where a sample's value holds until the next
    * sample (left-continuous step function; segments crossing midnight
    * are attributed to the day they start in only if they also end
    * there, keeping the weights exact and local). One series-keyed
    * window (lead) + one aggregation; Σ(v_c·Δt) is a BIGINT dot
    * product, so the only float op is the final floored division. */
  def timeWeightedAvg: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    samples(s, d)
      .withColumn("next_sec", lead(col("sec"), 1).over(w))
      .withColumn("next_day", lead(to_date(col("ts")), 1).over(w))
      .filter(col("next_sec").isNotNull && col("next_day") === to_date(col("ts")))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("v_c") * (col("next_sec") - col("sec"))).as("wsum"),
        sum(col("next_sec") - col("sec")).as("tsum"))
      .filter(col("tsum") > 0)
      .select(col("event_type"), col("day"), col("n_segments"),
        (floor(col("wsum") * 100 / col("tsum")) / 1e4).as("twa"))
      .orderBy(col("event_type"), col("day"))
  }

  val timeWeightedAvgSql: String =
    """WITH s AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(floor(value * 100) AS BIGINT) AS v_c,
                CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
                lead(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
                  OVER w AS next_sec,
                lead(CAST(ts AS DATE)) OVER w AS next_day
         FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
       SELECT event_type, day, count(*) AS n_segments,
              floor(CAST(sum(v_c * (next_sec - sec)) AS BIGINT) * 100
                    / CAST(sum(next_sec - sec) AS BIGINT)) / 1e4 AS twa
       FROM s
       WHERE next_sec IS NOT NULL AND next_day = day
       GROUP BY 1, 2 HAVING sum(next_sec - sec) > 0
       ORDER BY event_type, day"""

  // ------------------------------------------------- MAD outlier scan

  val MadK = 3.0

  /** Robust outlier detection: |x − median| > 3·MAD per series — the
    * alerting rule that, unlike z-scores, one wild sample cannot
    * poison (median and MAD have a 50% breakdown point). Exact
    * medians: over integer cents the median is k or k+0.5 and the MAD
    * lands on quarter-steps — all exactly representable doubles, so
    * both engines agree bit-for-bit with NO rounding tricks. The
    * median/MAD pair is a |series|-row table broadcast back; exact
    * percentile per bounded series count is the declared contract
    * (`q_approx_percentile` is the unbounded escape hatch). */
  def madAnomaly: Q = (s, d) => {
    val sm = samples(s, d)
    val med = sm.groupBy(col("event_type"))
      .agg(expr("percentile(v_c, 0.5e0)").as("med"))
    val dev = sm.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("v_c") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5e0)").as("mad"), max(col("med")).as("med"))
    dev.drop("med")
      .join(broadcast(mad), Seq("event_type"))
      // mad = 0 (a >50%-constant series) has no robust scale — skip the
      // series rather than divide by zero (engines disagree on 1/0.0)
      .filter(col("mad") > 0 && col("adev") > lit(MadK) * col("mad"))
      .select(col("event_type"), col("sec"), col("v_c"),
        col("med"), col("mad"),
        (floor(col("adev") * 1e4 / col("mad")) / 1e4).as("robust_score"))
      .orderBy(col("event_type"), col("sec"), col("v_c"))
  }

  val madAnomalySql: String =
    s"""WITH s AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
          FROM events),
        m AS (SELECT event_type, quantile_cont(v_c, 0.5) AS med FROM s GROUP BY 1),
        dv AS (SELECT s.event_type, s.sec, s.v_c, m.med, abs(s.v_c - m.med) AS adev
               FROM s JOIN m USING (event_type)),
        md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad, max(med) AS med
               FROM dv GROUP BY 1)
        SELECT dv.event_type, dv.sec, dv.v_c, md.med, md.mad,
               floor(dv.adev * 1e4 / md.mad) / 1e4 AS robust_score
        FROM dv JOIN md USING (event_type)
        WHERE md.mad > 0 AND dv.adev > $MadK * md.mad
        ORDER BY dv.event_type, dv.sec, dv.v_c"""

  // --------------------------------------------------- PromQL subquery

  val SubRateWindowSec = 600L  // inner rate window: 10 min
  val SubOuterBuckets = 6      // outer max_over_time: 1 h = 6 buckets

  /** PromQL subquery `max_over_time(rate(m[10m])[1h:10m])`: the inner
    * rate per 10-min bucket (counter-reset rule from
    * `metrics_counter_rate`, in exact cents), then a trailing-1h max
    * over the bucket series via a RANGE frame on the integer bucket
    * index — gaps in the series don't stretch the hour the way a ROWS
    * frame would. max() commutes with the final division, so the
    * increase stays BIGINT until one floored divide. Two windows + one
    * aggregation, all keyed by series. */
  def subqueryMaxRate: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val buckets = samples(s, d)
      .withColumn("delta", col("v_c") - lag(col("v_c"), 1).over(w))
      .withColumn("inc",
        when(col("delta").isNull, lit(0L))
          .when(col("delta") < 0, col("v_c"))
          .otherwise(col("delta")))
      .groupBy(col("event_type"), expr(s"sec DIV $SubRateWindowSec").as("bucket"))
      .agg(sum(col("inc")).as("inc_c"))
    val wRange = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rangeBetween(-(SubOuterBuckets - 1), Window.currentRow)
    buckets
      .withColumn("max_inc", max(col("inc_c")).over(wRange))
      .select(col("event_type"),
        (col("bucket") * SubRateWindowSec).as("bucket_sec"),
        (floor(col("max_inc") * lit(10000) / lit(SubRateWindowSec)) / 1e6).as("max_rate"))
      .orderBy(col("event_type"), col("bucket_sec"))
  }

  val subqueryMaxRateSql: String =
    s"""WITH s AS (
          SELECT event_type, ts, event_id,
                 CAST(floor(value * 100) AS BIGINT) AS v_c,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
          FROM events),
        del AS (
          SELECT event_type, sec,
                 v_c - lag(v_c) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS delta,
                 v_c
          FROM s),
        b AS (
          SELECT event_type, sec // $SubRateWindowSec AS bucket,
                 CAST(sum(CASE WHEN delta IS NULL THEN 0
                               WHEN delta < 0 THEN v_c ELSE delta END) AS BIGINT) AS inc_c
          FROM del GROUP BY 1, 2),
        mx AS (
          SELECT event_type, bucket,
                 max(inc_c) OVER (PARTITION BY event_type ORDER BY bucket
                   RANGE BETWEEN ${SubOuterBuckets - 1} PRECEDING AND CURRENT ROW) AS max_inc
          FROM b)
        SELECT event_type, CAST(bucket * $SubRateWindowSec AS BIGINT) AS bucket_sec,
               floor(max_inc * 10000 / $SubRateWindowSec) / 1e6 AS max_rate
        FROM mx ORDER BY event_type, bucket_sec"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("metrics_time_weighted_avg", timeWeightedAvg, Some(timeWeightedAvgSql)),
    ("metrics_mad_anomaly", madAnomaly, Some(madAnomalySql)),
    ("metrics_subquery_maxrate", subqueryMaxRate, Some(subqueryMaxRateSql)))
}
