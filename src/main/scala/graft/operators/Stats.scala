package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution / trend statistics read directly off aggregates — the
  * "statistical read" surface a monitoring engine needs beyond plain
  * rollups (the reference emits raw gauges, e.g.
  * collector/exporters/mysql/mysql-exporter.go:12-48; judging whether
  * a gauge is TRENDING or CONCENTRATING is left to the query layer —
  * this is that layer).
  *
  * Float parity strategy (shared with Models/Affinity): every mass,
  * rank and count is an exact integer (cents via `floor(price*100)`,
  * wide products in DECIMAL(38,0) vs DuckDB HUGEINT); each emitted
  * real number is ONE fixed sequence of IEEE ops over those exact
  * inputs, spelled identically in both engines, display-floored at
  * 1e4.
  *
  * Scale design (100 TB): nothing here sorts the corpus. Gini ranks
  * CUSTOMERS-WITH-REVENUE (already one aggregation smaller than the
  * fact) inside per-nation windows; Mann–Kendall and the runs test
  * operate on the per-series DAY spine (bounded by the time span, not
  * the event volume — the |days|² pair join is per-series constant);
  * the price–volume bridge is one conditional aggregation.
  */
object Stats {

  type Q = (SparkSession, String) => DataFrame

  private val dayCol =
    expr("cast(unix_timestamp(date_trunc('second', ts)) div 86400 as bigint)")
  private val daySql =
    "CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400"

  /** Gini coefficient of order-revenue concentration per nation.
    * Rank i over (cust_cents, custkey) within the nation makes the
    * standard G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) well-defined under
    * ties; Σi·xᵢ accumulates in DECIMAL(38,0) (HUGEINT in the oracle)
    * so the formula is exact until one final double division. */
  def giniRevenue: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .select(col("o_custkey"), floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cust_cents"))
    val byNation = rev
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey").as("custkey"), col("cust_cents"))
    val ranked = byNation.withColumn("i", row_number().over(
      Window.partitionBy(col("n_name")).orderBy(col("cust_cents"), col("custkey"))))
    ranked.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cust_cents")).as("total_cents"),
        sum(col("i").cast("decimal(38,0)") * col("cust_cents")).as("sixy"))
      .select(col("n_name"), col("n_cust"), col("total_cents"),
        (floor((lit(2).cast("decimal(38,0)") * col("sixy")
            - (col("n_cust") + 1).cast("decimal(38,0)") * col("total_cents")).cast("double")
          / (col("n_cust").cast("decimal(38,0)") * col("total_cents")).cast("double")
          * 1e4) / 1e4).as("gini"))
      .orderBy(col("n_name"))
  }

  val giniRevenueSql: String =
    """WITH rev AS (
         SELECT o_custkey,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cust_cents
         FROM orders GROUP BY 1),
       j AS (
         SELECT n_name, o_custkey AS custkey, cust_cents
         FROM rev JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey),
       r AS (
         SELECT n_name, custkey, cust_cents,
                row_number() OVER (PARTITION BY n_name
                                   ORDER BY cust_cents, custkey) AS i
         FROM j)
       SELECT n_name, count(*) AS n_cust,
              CAST(sum(cust_cents) AS BIGINT) AS total_cents,
              floor(CAST(2 * sum(CAST(i AS HUGEINT) * cust_cents)
                         - (count(*) + 1) * CAST(sum(cust_cents) AS HUGEINT) AS DOUBLE)
                    / CAST(count(*) * CAST(sum(cust_cents) AS HUGEINT) AS DOUBLE)
                    * 1e4) / 1e4 AS gini
       FROM r GROUP BY n_name ORDER BY n_name"""

  /** Per-series daily event counts — the shared spine for the two
    * trend tests below. Exact BIGINTs; |days| is bounded by the time
    * span, never by event volume. */
  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), dayCol.as("day"))
      .agg(count(lit(1)).as("cnt"))

  private val dailySql =
    s"""SELECT event_type, $daySql AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2"""

  /** Mann–Kendall trend test per series: S = Σ_{i<j} sign(cnt_j − cnt_i)
    * over the day spine, plus the ×18-scaled variance numerator
    * n(n−1)(2n+5) so a consumer can form the z-score without the
    * engine emitting any irrational number. The pair join is keyed on
    * the series and quadratic only in |days|. */
  def mannKendall: Q = (s, d) => {
    val daily = dailyCounts(s, d)
    val a = daily.select(col("event_type"), col("day").as("d1"), col("cnt").as("c1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("cnt").as("c2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("c2") > col("c1"), 1L).when(col("c2") < col("c1"), -1L)
          .otherwise(0L)).as("s_stat"))
    val days = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    days.join(pairs, Seq("event_type"))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5))
      .withColumn("trend",
        when(col("s_stat") > 0, lit("increasing"))
          .when(col("s_stat") < 0, lit("decreasing")).otherwise(lit("flat")))
      .select(col("event_type"), col("n_days"), col("n_pairs"), col("s_stat"),
        col("var18"), col("trend"))
      .orderBy(col("event_type"))
  }

  val mannKendallSql: String =
    s"""WITH daily AS ($dailySql),
        pairs AS (
          SELECT a.event_type, count(*) AS n_pairs,
                 CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                               WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.day < b.day
          GROUP BY 1),
        days AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
        SELECT event_type, n_days, n_pairs, s_stat,
               n_days * (n_days - 1) * (2 * n_days + 5) AS var18,
               CASE WHEN s_stat > 0 THEN 'increasing'
                    WHEN s_stat < 0 THEN 'decreasing' ELSE 'flat' END AS trend
        FROM days JOIN pairs USING (event_type) ORDER BY event_type"""

  /** Wald–Wolfowitz runs test on the sign of the day-over-day delta
    * per series: ties dropped, a run ends whenever the sign flips.
    * n_runs and both sign counts are exact; the expected-runs
    * reference value 1 + 2·n⁺·n⁻/N is the one emitted real. */
  def runsTest: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val signs = dailyCounts(s, d)
      .withColumn("prev", lag(col("cnt"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("sgn", when(col("cnt") > col("prev"), 1)
        .when(col("cnt") < col("prev"), -1).otherwise(0))
      .filter(col("sgn") =!= 0)
    signs.withColumn("psgn", lag(col("sgn"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("psgn").isNull || col("psgn") =!= col("sgn"), 1L)
          .otherwise(0L)).as("n_runs"))
      .withColumn("expected_runs",
        lit(1.0) + floor((lit(2) * col("n_pos") * col("n_neg")).cast("double")
          / col("n_obs").cast("double") * 1e4) / 1e4)
      .select(col("event_type"), col("n_obs"), col("n_pos"), col("n_neg"),
        col("n_runs"), col("expected_runs"))
      .orderBy(col("event_type"))
  }

  val runsTestSql: String =
    s"""WITH daily AS ($dailySql),
        lagged AS (
          SELECT event_type, day, cnt,
                 lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
          FROM daily),
        signs AS (
          SELECT event_type, day,
                 CASE WHEN cnt > prev THEN 1 WHEN cnt < prev THEN -1 ELSE 0 END AS sgn
          FROM lagged WHERE prev IS NOT NULL),
        nz AS (
          SELECT event_type, day, sgn,
                 lag(sgn) OVER (PARTITION BY event_type ORDER BY day) AS psgn
          FROM signs WHERE sgn <> 0)
        SELECT event_type, count(*) AS n_obs,
               CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
               CAST(sum(CASE WHEN psgn IS NULL OR psgn <> sgn THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_runs,
               1.0 + floor(CAST(2 * sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                                  * sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) * 1e4) / 1e4 AS expected_runs
        FROM nz GROUP BY event_type ORDER BY event_type"""

  /** Price–volume bridge 1995 → 1996 per order priority: the revenue
    * delta decomposed into a volume effect at period-A average price
    * plus the residual price effect. One conditional aggregation;
    * volume_effect is the single IEEE division, price_effect the
    * exact remainder so the decomposition sums to delta_cents
    * bit-for-bit. */
  def waterfallBridge: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_orderpriority"),
      year(col("o_orderdate")).as("yr"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
    o.filter(col("yr").isin(1995, 1996))
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("yr") === 1995, col("cents")).otherwise(0L)).as("cents_a"),
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("yr") === 1996, col("cents")).otherwise(0L)).as("cents_b"))
      .withColumn("delta_cents", col("cents_b") - col("cents_a"))
      .withColumn("volume_effect",
        floor(((col("n_b") - col("n_a")) * col("cents_a")).cast("double")
          / col("n_a").cast("double")).cast("double"))
      .withColumn("price_effect", col("delta_cents").cast("double") - col("volume_effect"))
      .select(col("o_orderpriority"), col("n_a"), col("n_b"), col("cents_a"),
        col("cents_b"), col("delta_cents"), col("volume_effect"), col("price_effect"))
      .orderBy(col("o_orderpriority"))
  }

  val waterfallBridgeSql: String =
    """WITH o AS (
         SELECT o_orderpriority, EXTRACT(YEAR FROM o_orderdate) AS yr,
                CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)),
       g AS (
         SELECT o_orderpriority,
                CAST(sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN yr = 1995 THEN cents ELSE 0 END) AS BIGINT) AS cents_a,
                CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS BIGINT) AS cents_b
         FROM o GROUP BY 1)
       SELECT o_orderpriority, n_a, n_b, cents_a, cents_b,
              cents_b - cents_a AS delta_cents,
              floor(CAST((n_b - n_a) * cents_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                AS volume_effect,
              CAST(cents_b - cents_a AS DOUBLE)
                - floor(CAST((n_b - n_a) * cents_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                AS price_effect
       FROM g ORDER BY o_orderpriority"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_gini_revenue", giniRevenue, Some(giniRevenueSql)),
    ("q_mann_kendall", mannKendall, Some(mannKendallSql)),
    ("q_runs_test", runsTest, Some(runsTestSql)),
    ("q_waterfall_bridge", waterfallBridge, Some(waterfallBridgeSql)))
}
