package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based nonparametric tests and multiple-testing control — the
  * distribution-free complement to Stats' parametric family (Welch t,
  * χ², KS): Mann–Whitney U, Kruskal–Wallis H, Benjamini–Hochberg FDR,
  * and Cramér's V. A monitoring engine compares latency/volume
  * distributions whose shape it cannot assume; rank tests are the
  * standard tool (the reference emits the raw gauges —
  * collector/exporters/mysql/mysql-exporter.go:12-48 — and leaves the
  * judgment to this layer).
  *
  * Float parity strategy (the Stats contract): ranks, rank sums and tie
  * terms are exact integers on the ×2 scale (average ranks of ties are
  * half-integers, so 2·rank is an integer), accumulated in
  * DECIMAL(38,0)/HUGEINT; each emitted real is ONE fixed IEEE op
  * sequence over those exact inputs, floored once for display. The
  * Cramér χ² total avoids a cross-cell float-sum ordering problem by
  * flooring each cell term to a 1e-6 grid first — the sum is then an
  * exact integer in both engines.
  *
  * Scale design (100 TB): every test runs on a VALUE-DOMAIN histogram
  * (≤50 quantity levels, |priorities|×|statuses| cells, |types|×7
  * cells), never on corpus rows — the rank windows see dozens of rows
  * at any data size.
  */
object RankStats {

  type Q = (SparkSession, String) => DataFrame

  /** Quantity histogram by return flag: the shared value-domain spine
    * (l_quantity is integral 1..50 by TPC-H construction). */
  private def qtyHist(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").cast("int").as("qty"))
      .agg(count(lit(1)).as("cnt"))

  private val qtyHistSql =
    """SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty,
              count(*) AS cnt
       FROM lineitem GROUP BY 1, 2"""

  // ------------------------------------------------ Mann–Whitney U

  /** Mann–Whitney U ('A' vs 'R' return flags over the quantity
    * distribution), ties handled with average ranks on the exact ×2
    * scale: 2·rank(v) = 2·|{< v}| + cnt(v) + 1. U₁×2 = R₁×2 − n₁(n₁+1)
    * stays integral (DECIMAL(38,0)/HUGEINT — n² outgrows BIGINT around
    * N≈3e9); the tie-corrected z is one fixed double sequence. */
  def mannWhitneyU: Q = (s, d) => {
    val byQty = qtyHist(s, d).filter(col("flag").isin("A", "R"))
      .groupBy(col("qty"))
      .agg(sum(when(col("flag") === "A", col("cnt")).otherwise(0L)).as("cnt_a"),
        sum(when(col("flag") === "R", col("cnt")).otherwise(0L)).as("cnt_r"))
      .withColumn("cnt", col("cnt_a") + col("cnt_r"))
    val w = Window.orderBy(col("qty")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byQty
      .withColumn("cumlt", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumlt") + col("cnt") + 1L)
    ranked.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_r")).as("n_r"),
      sum(col("cnt_a").cast("decimal(38,0)") * col("r2")).as("r1_x2"),
      sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
        - col("cnt")).as("tie_term"))
      .select(col("n_a"), col("n_r"),
        (col("r1_x2") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
          .cast("double").as("u1_x2"),
        col("tie_term").cast("double").as("tie_term"), {
          val na = col("n_a").cast("double"); val nr = col("n_r").cast("double")
          val n = na + nr
          val u1 = (col("r1_x2") - col("n_a").cast("decimal(38,0)")
            * (col("n_a") + 1)).cast("double") / 2.0
          val mean = na * nr / 2.0
          val variance = na * nr / 12.0 *
            ((n + 1.0) - col("tie_term").cast("double") / (n * (n - 1.0)))
          (floor((u1 - mean) / sqrt(variance) * 1e4) / 1e4).as("z")
        })
  }

  val mannWhitneyUSql: String =
    s"""WITH h AS ($qtyHistSql),
       byqty AS (
         SELECT qty,
                CAST(sum(CASE WHEN flag = 'A' THEN cnt ELSE 0 END) AS BIGINT)
                  AS cnt_a,
                CAST(sum(CASE WHEN flag = 'R' THEN cnt ELSE 0 END) AS BIGINT)
                  AS cnt_r
         FROM h WHERE flag IN ('A', 'R') GROUP BY 1),
       r AS (
         SELECT qty, cnt_a, cnt_r, cnt_a + cnt_r AS cnt,
                coalesce(sum(cnt_a + cnt_r) OVER (ORDER BY qty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cumlt
         FROM byqty),
       agg AS (
         SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
                CAST(sum(cnt_r) AS BIGINT) AS n_r,
                sum(CAST(cnt_a AS HUGEINT) * (2 * cumlt + cnt + 1)) AS r1_x2,
                sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
         FROM r)
       SELECT n_a, n_r,
              CAST(r1_x2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) AS u1_x2,
              CAST(tie_term AS DOUBLE) AS tie_term,
              floor((CAST(r1_x2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0
                     - CAST(n_a AS DOUBLE) * CAST(n_r AS DOUBLE) / 2.0)
                    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_r AS DOUBLE) / 12.0
                           * ((CAST(n_a AS DOUBLE) + CAST(n_r AS DOUBLE) + 1.0)
                              - CAST(tie_term AS DOUBLE)
                                / ((CAST(n_a AS DOUBLE) + CAST(n_r AS DOUBLE))
                                   * (CAST(n_a AS DOUBLE) + CAST(n_r AS DOUBLE) - 1.0))))
                    * 1e4) / 1e4 AS z
       FROM agg"""

  // ------------------------------------------------ Kruskal–Wallis H

  /** Kruskal–Wallis across all three return flags: per-group rank sums
    * on the ×2 scale; H = 3/(N(N+1))·Σ Rⱼ²ₓ₂/nⱼ − 3(N+1) with the
    * three group terms added in fixed A+N+R order (one explicit
    * left-to-right sum, not an engine-ordered aggregate); tie-corrected
    * by C = 1 − Στ/(N³−N). Emits the per-group rank sums plus the
    * shared H on each row. */
  def kruskalWallis: Q = (s, d) => {
    val byQty = qtyHist(s, d)
      .groupBy(col("qty"))
      .agg(sum(when(col("flag") === "A", col("cnt")).otherwise(0L)).as("cnt_a"),
        sum(when(col("flag") === "N", col("cnt")).otherwise(0L)).as("cnt_n"),
        sum(when(col("flag") === "R", col("cnt")).otherwise(0L)).as("cnt_r"))
      .withColumn("cnt", col("cnt_a") + col("cnt_n") + col("cnt_r"))
    val w = Window.orderBy(col("qty")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byQty
      .withColumn("cumlt", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cumlt") + col("cnt") + 1L)
    val agg = ranked.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_n")).as("n_n"),
      sum(col("cnt_r")).as("n_r"),
      sum(col("cnt_a").cast("decimal(38,0)") * col("r2")).as("ra_x2"),
      sum(col("cnt_n").cast("decimal(38,0)") * col("r2")).as("rn_x2"),
      sum(col("cnt_r").cast("decimal(38,0)") * col("r2")).as("rr_x2"),
      sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
        - col("cnt")).as("tie_term"))
    val h = agg.select(col("n_a"), col("n_n"), col("n_r"),
      col("ra_x2").cast("double").as("ra_x2"),
      col("rn_x2").cast("double").as("rn_x2"),
      col("rr_x2").cast("double").as("rr_x2"), {
        val n = (col("n_a") + col("n_n") + col("n_r")).cast("double")
        val sumTerm =
          col("ra_x2").cast("double") * col("ra_x2").cast("double") / col("n_a").cast("double") +
            col("rn_x2").cast("double") * col("rn_x2").cast("double") / col("n_n").cast("double") +
            col("rr_x2").cast("double") * col("rr_x2").cast("double") / col("n_r").cast("double")
        val hraw = lit(3.0) / (n * (n + 1.0)) * sumTerm - lit(3.0) * (n + 1.0)
        val c = lit(1.0) - col("tie_term").cast("double") / (n * n * n - n)
        (floor(hraw / c * 1e4) / 1e4).as("h_corr")
      })
    // one row per group, the shared statistic repeated
    h.selectExpr("stack(3, 'A', n_a, ra_x2, 'N', n_n, rn_x2, 'R', n_r, rr_x2) as (flag, n_j, r_sum_x2)",
      "h_corr")
      .orderBy(col("flag"))
  }

  val kruskalWallisSql: String =
    s"""WITH h AS ($qtyHistSql),
       byqty AS (
         SELECT qty,
                CAST(sum(CASE WHEN flag = 'A' THEN cnt ELSE 0 END) AS BIGINT) AS cnt_a,
                CAST(sum(CASE WHEN flag = 'N' THEN cnt ELSE 0 END) AS BIGINT) AS cnt_n,
                CAST(sum(CASE WHEN flag = 'R' THEN cnt ELSE 0 END) AS BIGINT) AS cnt_r
         FROM h GROUP BY 1),
       r AS (
         SELECT *, cnt_a + cnt_n + cnt_r AS cnt,
                coalesce(sum(cnt_a + cnt_n + cnt_r) OVER (ORDER BY qty
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt
         FROM byqty),
       agg AS (
         SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
                CAST(sum(cnt_n) AS BIGINT) AS n_n,
                CAST(sum(cnt_r) AS BIGINT) AS n_r,
                sum(CAST(cnt_a AS HUGEINT) * (2 * cumlt + cnt + 1)) AS ra_x2,
                sum(CAST(cnt_n AS HUGEINT) * (2 * cumlt + cnt + 1)) AS rn_x2,
                sum(CAST(cnt_r AS HUGEINT) * (2 * cumlt + cnt + 1)) AS rr_x2,
                sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
         FROM r),
       stat AS (
         SELECT n_a, n_n, n_r,
                CAST(ra_x2 AS DOUBLE) AS ra_x2, CAST(rn_x2 AS DOUBLE) AS rn_x2,
                CAST(rr_x2 AS DOUBLE) AS rr_x2,
                CAST(n_a + n_n + n_r AS DOUBLE) AS n,
                CAST(tie_term AS DOUBLE) AS tie_term
         FROM agg),
       hh AS (
         SELECT *,
                floor((3.0 / (n * (n + 1.0))
                       * (ra_x2 * ra_x2 / CAST(n_a AS DOUBLE)
                          + rn_x2 * rn_x2 / CAST(n_n AS DOUBLE)
                          + rr_x2 * rr_x2 / CAST(n_r AS DOUBLE))
                       - 3.0 * (n + 1.0))
                      / (1.0 - tie_term / (n * n * n - n)) * 1e4) / 1e4
                  AS h_corr
         FROM stat)
       SELECT 'A' AS flag, n_a AS n_j, ra_x2 AS r_sum_x2, h_corr FROM hh
       UNION ALL SELECT 'N', n_n, rn_x2, h_corr FROM hh
       UNION ALL SELECT 'R', n_r, rr_x2, h_corr FROM hh
       ORDER BY flag"""

  // ------------------------------------------------ Benjamini–Hochberg

  /** Benjamini–Hochberg step-up FDR control (α = 0.2) over the
    * |types|×|dows| contingency cells: each cell's χ² term (exact
    * integer inputs, one double sequence) becomes the surrogate
    * p = 1/(1+term); ranks ascend by (p, type, dow); the step-up
    * rejects every rank ≤ max{i : p₍ᵢ₎ ≤ i·α/m}. Both rank windows run
    * over the cell table — dozens of rows at any scale. */
  def bhFdr: Q = (s, d) => {
    // the cells/margins frame and the χ² term are Affinity's ONE shared
    // definition (chi2CellMargins / chi2TermCol) — spelled once so the
    // cast-before-multiply overflow discipline can never fork
    val terms = Affinity.chi2CellMargins(s, d)
      .select(col("event_type"), col("dow"), col("m"),
        (lit(1.0) / (lit(1.0) + Affinity.chi2TermCol)).as("p"))
    val ranked = terms.withColumn("rank",
      row_number().over(Window.orderBy(col("p"), col("event_type"), col("dow")))
        .cast("long"))
    ranked
      .withColumn("kmax",
        max(when(col("p") <= col("rank").cast("double") * 0.2 / col("m").cast("double"),
          col("rank"))).over(Window.partitionBy()))
      .select(col("event_type"), col("dow"), col("rank"),
        (floor(col("p") * 1e6) / 1e6).as("p_floor"),
        (col("kmax").isNotNull && col("rank") <= col("kmax")).as("rejected"))
      .orderBy(col("rank"))
  }

  val bhFdrSql: String =
    s"""WITH ${Affinity.chi2CellMarginsSql},
       p AS (
         SELECT event_type, dow, m,
                1.0 / (1.0 + ${Affinity.chi2TermSqlExpr}) AS p
         FROM margins),
       ranked AS (
         SELECT *, row_number() OVER (ORDER BY p, event_type, dow) AS rank
         FROM p),
       k AS (
         SELECT *,
                max(CASE WHEN p <= CAST(rank AS DOUBLE) * 0.2 / CAST(m AS DOUBLE)
                         THEN rank END) OVER () AS kmax
         FROM ranked)
       SELECT event_type, dow, rank, floor(p * 1e6) / 1e6 AS p_floor,
              (kmax IS NOT NULL AND rank <= kmax) AS rejected
       FROM k ORDER BY rank"""

  // ------------------------------------------------ Cramér's V

  /** Cramér's V over the order-priority × order-status contingency:
    * each cell's χ² term is floored to the 1e-6 grid FIRST, so the
    * cross-cell total is an exact integer sum in both engines (no float
    * summation-order hazard); V = sqrt(χ²/(N·min(r−1,c−1))) is then one
    * fixed double sequence. */
  def cramersV: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("o"))
    val wAll = Window.partitionBy()
    val terms = cells
      .withColumn("t", sum(col("o")).over(wAll))
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("pri"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("st"))))
      .withColumn("n_r", size(collect_set(col("pri")).over(wAll)))
      .withColumn("n_c", size(collect_set(col("st")).over(wAll)))
      .withColumn("term_u", {
        val num = col("o").cast("double") * col("t").cast("double") -
          col("r").cast("double") * col("c").cast("double")
        val den = col("r").cast("double") * col("c").cast("double") * col("t").cast("double")
        floor(num * num / den * 1e6).cast("long")
      })
    terms.groupBy()
      .agg(max(col("t")).as("n"), max(col("n_r")).as("r_levels"),
        max(col("n_c")).as("c_levels"), sum(col("term_u")).as("chi2_u"))
      .select(col("n"), col("r_levels").cast("long").as("r_levels"),
        col("c_levels").cast("long").as("c_levels"), col("chi2_u"),
        (floor(sqrt(col("chi2_u").cast("double") / 1e6 /
          (col("n").cast("double") *
            least(col("r_levels") - 1, col("c_levels") - 1).cast("double")))
          * 1e4) / 1e4).as("cramers_v"))
  }

  val cramersVSql: String =
    """WITH cells AS (
         SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS o
         FROM orders GROUP BY 1, 2),
       m AS (
         SELECT pri, st, o,
                CAST(sum(o) OVER () AS BIGINT) AS t,
                CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS r,
                CAST(sum(o) OVER (PARTITION BY st) AS BIGINT) AS c
         FROM cells),
       lv AS (
         SELECT count(DISTINCT pri) AS r_levels, count(DISTINCT st) AS c_levels
         FROM cells),
       terms AS (
         SELECT t,
                CAST(floor((o::DOUBLE * t::DOUBLE - r::DOUBLE * c::DOUBLE)
                           * (o::DOUBLE * t::DOUBLE - r::DOUBLE * c::DOUBLE)
                           / (r::DOUBLE * c::DOUBLE * t::DOUBLE) * 1e6) AS BIGINT)
                  AS term_u
         FROM m)
       SELECT max(t) AS n, CAST(min(lv.r_levels) AS BIGINT) AS r_levels,
              CAST(min(lv.c_levels) AS BIGINT) AS c_levels,
              CAST(sum(term_u) AS BIGINT) AS chi2_u,
              floor(sqrt(CAST(sum(term_u) AS DOUBLE) / 1e6
                         / (CAST(max(t) AS DOUBLE)
                            * CAST(least(min(lv.r_levels), min(lv.c_levels)) - 1
                                   AS DOUBLE))) * 1e4) / 1e4 AS cramers_v
       FROM terms, lv"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("q_mann_whitney_u", mannWhitneyU, Some(mannWhitneyUSql)),
    ("q_kruskal_wallis", kruskalWallis, Some(kruskalWallisSql)),
    ("q_bh_fdr", bhFdr, Some(bhFdrSql)),
    ("q_cramers_v", cramersV, Some(cramersVSql)))
}
