package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series model registry — the "model parameters as a dimension"
  * pattern: TRAIN a tiny model per series in one aggregation, store it
  * as a |series|-row registry table, and SCORE any later scan by
  * BROADCAST-joining the registry back onto the data. At 100 TB the
  * registry stays KBs while the scored fact is unbounded — scoring is
  * a narrow map after one broadcast join, and retraining touches only
  * the training window. The same shape serves per-device thresholds,
  * per-tenant quotas, per-series seasonal baselines.
  *
  * The model here is the least-squares line `metrics_deriv` fits, but
  * trained ONCE over the first 480 hours and applied to the remaining
  * hours (walk-forward split, no leakage). Float parity: all moments
  * are exact BIGINTs over a CENTERED hour index (xi = hour − h0, so
  * every product stays < 2^53 and casts to DOUBLE exactly); the
  * prediction is a fixed sequence of IEEE ops on those exact inputs,
  * spelled verbatim in both engines.
  */
object Models {

  type Q = (SparkSession, String) => DataFrame

  /** Training window: hours [0, 480) of the corpus span; scoring = the rest. */
  val TrainHours = 480

  /** ŷ in ym units (1e4-scaled): ȳ + slope·(x − x̄), every operand cast
    * to DOUBLE from an exact-in-double BIGINT, identical op order in
    * both engines. */
  private val predExpr: String =
    """CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
       + (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
         * (CAST(xi AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"""

  def registryScore: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("hour_sec"))
      .agg(floor(round(sum(col("value")), 2) / count(lit(1)) * 1e4).cast("long").as("ym"))
    val h0 = hourly.agg(min(expr("hour_sec DIV 3600")).as("x0"))
    val indexed = hourly.crossJoin(broadcast(h0))
      .withColumn("xi", expr("hour_sec DIV 3600 - x0"))
    val registry = indexed.filter(col("xi") < TrainHours)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"), sum(col("ym")).as("sy"),
        sum(col("xi") * col("ym")).as("sxy"), sum(col("xi") * col("xi")).as("sxx"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .filter(col("n") >= 12 && col("den") > 0)
      .select(col("event_type"), col("n"), col("sx"), col("sy"), col("num"), col("den"))
    indexed.filter(col("xi") >= TrainHours)
      .join(broadcast(registry), Seq("event_type"))
      .withColumn("predicted", floor(expr(predExpr)) / 1e4)
      .withColumn("avg_value", col("ym") / 1e4)
      .withColumn("residual", col("avg_value") - col("predicted"))
      .withColumn("is_anomaly", abs(col("residual")) > 50.0)
      .select(col("event_type"), col("hour_sec"), col("avg_value"),
        col("predicted"), col("residual"), col("is_anomaly"))
      .orderBy(col("event_type"), col("hour_sec"))
  }

  val registryScoreSql: String =
    s"""WITH hourly AS (
         SELECT event_type, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour_sec,
                CAST(floor(round(sum(value), 2) / count(*) * 1e4) AS BIGINT) AS ym
         FROM events GROUP BY 1, 2),
       h0 AS (SELECT min(hour_sec // 3600) AS x0 FROM hourly),
       idx AS (
         SELECT event_type, hour_sec, ym, hour_sec // 3600 - x0 AS xi
         FROM hourly CROSS JOIN h0),
       registry AS (
         SELECT event_type, n, sx, sy, num, den FROM (
           SELECT event_type, count(*) AS n, sum(xi) AS sx, sum(ym) AS sy,
                  sum(xi * ym) AS sxy, sum(xi * xi) AS sxx,
                  count(*) * sum(xi * ym) - sum(xi) * sum(ym) AS num,
                  count(*) * sum(xi * xi) - sum(xi) * sum(xi) AS den
           FROM idx WHERE xi < $TrainHours GROUP BY event_type) t
         WHERE n >= 12 AND den > 0)
       SELECT i.event_type, i.hour_sec, i.ym / 1e4 AS avg_value,
              floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                    + (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                      * (CAST(xi AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4
                AS predicted,
              i.ym / 1e4 - floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                    + (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                      * (CAST(xi AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4
                AS residual,
              abs(i.ym / 1e4 - floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                    + (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                      * (CAST(xi AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4)
                > 50.0 AS is_anomaly
       FROM idx i JOIN registry USING (event_type)
       WHERE i.xi >= $TrainHours
       ORDER BY i.event_type, i.hour_sec"""

  val LiftBuckets = 10

  /** Decile lift / gains table — the standard evaluation read for any
    * scoring model: rank the population by score, cut into deciles,
    * and report what share of the positives each cumulative decile
    * captures vs the base rate. Score = order value in exact cents,
    * positive = urgent priority. Decile EDGES come from ONE exact-
    * percentile aggregate broadcast back over the scan (the
    * `q_equidepth_histogram` idiom — no corpus ntile sort); all
    * counts and cumulative masses are exact BIGINTs over the 10-row
    * aggregate, with capture and lift each one IEEE division of
    * exact integer products. At 100 TB: one percentile pass + one
    * 10-group agg, nothing corpus-sized is ever sorted. */
  def decileLift: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import graft.sources.Tables
    val o = Tables.orders(s, d).select(
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("pos"))
    val qs = (1 until LiftBuckets).map(i => i.toDouble / LiftBuckets)
    val bounds = o.agg(
      expr(s"percentile(cents, array(${qs.map(q => s"${q}e0").mkString(", ")}))").as("b"))
    val bucket = (lit(1) +: (0 until LiftBuckets - 1)
      .map(i => when(col("cents") > col("b")(i), 1).otherwise(0)))
      .reduce(_ + _)
    val g = o.crossJoin(broadcast(bounds))
      .select((lit(LiftBuckets + 1) - bucket).cast("int").as("decile"), col("pos"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val ord = Window.orderBy(col("decile"))
    val whole = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum_n", sum(col("n"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_pos", sum(col("n_pos"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_n", sum(col("n")).over(whole))
      .withColumn("total_pos", sum(col("n_pos")).over(whole))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        floor(col("cum_pos").cast("double") / col("total_pos").cast("double") * 10000)
          .divide(10000.0).as("capture"),
        floor((col("cum_pos") * col("total_n")).cast("double")
            / (col("cum_n") * col("total_pos")).cast("double") * 10000)
          .divide(10000.0).as("cum_lift"))
      .orderBy(col("decile"))
  }

  val decileLiftSql: String = {
    val qs = (1 until LiftBuckets).map(i => i.toDouble / LiftBuckets)
    val terms = (1 until LiftBuckets).map(i => s"(cents > b[$i])::INT").mkString(" + ")
    s"""WITH c AS (
          SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
          FROM orders),
        b AS (SELECT quantile_cont(cents, [${qs.mkString(", ")}]) AS b FROM c),
        a AS (SELECT CAST(${LiftBuckets + 1} - (1 + $terms) AS INT) AS decile, pos
              FROM c CROSS JOIN b),
        g AS (SELECT decile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
              FROM a GROUP BY 1),
        w AS (SELECT decile, n, n_pos,
                     CAST(sum(n) OVER (ORDER BY decile
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                     CAST(sum(n_pos) OVER (ORDER BY decile
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                     CAST(sum(n) OVER () AS BIGINT) AS total_n,
                     CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
              FROM g)
        SELECT decile, n, n_pos, cum_n, cum_pos,
               floor(CAST(cum_pos AS DOUBLE) / CAST(total_pos AS DOUBLE) * 10000)
                 / 10000.0 AS capture,
               floor(CAST(cum_pos * total_n AS DOUBLE)
                     / CAST(cum_n * total_pos AS DOUBLE) * 10000) / 10000.0 AS cum_lift
        FROM w ORDER BY decile"""
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("model_registry_score", registryScore, Some(registryScoreSql)),
    ("q_decile_lift", decileLift, Some(decileLiftSql)))
}
