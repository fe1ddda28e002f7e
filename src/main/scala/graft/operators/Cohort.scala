package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort / retention analysis — the "do customers come back"
  * matrix every product team reads: customers grouped by the month of
  * their FIRST order (the cohort), then counted as active at each
  * month offset where they ordered again.
  *
  * Scale design (100 TB): two aggregations on the same customer key —
  * first-order month per customer (min, map-side combinable), then the
  * fact join back on that key (co-partitioned; AQE broadcasts the
  * cohort side when it fits) and the (cohort, offset) distinct-count.
  * Month arithmetic is integer (year·12 + month), so offsets are
  * engine-exact; no float surface anywhere. At petabyte scale the
  * distinct count swaps for `graft_theta` per matrix cell — same
  * shape, mergeable.
  */
object Cohort {

  type Q = (SparkSession, String) => DataFrame

  def cohortRetention: Q = (s, d) => {
    val mi = year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
    val orders = Tables.orders(s, d)
      .select(col("o_custkey"), mi.as("m"))
    val firsts = orders.groupBy(col("o_custkey"))
      .agg(min(col("m")).as("cohort_m"))
    orders.join(firsts, Seq("o_custkey"))
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("month_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
      .orderBy(col("cohort_m"), col("month_offset"))
  }

  val cohortRetentionSql: String =
    """WITH o AS (
         SELECT o_custkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS m
         FROM orders),
       f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1)
       SELECT f.cohort_m, o.m - f.cohort_m AS month_offset,
              count(DISTINCT o.o_custkey) AS n_active
       FROM o JOIN f USING (o_custkey)
       GROUP BY 1, 2 ORDER BY cohort_m, month_offset"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("cohort_retention", cohortRetention, Some(cohortRetentionSql)))
}
