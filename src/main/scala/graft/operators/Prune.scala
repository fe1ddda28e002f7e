package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-reduction operators: ship less into the shuffle.
  *
  * At 100 TB the dominant cost of a selective fact⋈dim join is
  * shuffling fact rows that the dim side will discard. The fix is a
  * semi-join reduction: build a compact membership sketch of the dim
  * keys, broadcast it, and drop non-members BEFORE the exchange —
  * Spark's own runtime row-level filters do exactly this when
  * statistics trigger them; `bloomJoinPrune` makes the plan explicit
  * and deterministic.
  */
object Prune {

  type Q = (SparkSession, String) => DataFrame

  /** Bloom-filter semi-join reduction: urgent high-value orders (the
    * small side) → Bloom filter over their keys → fact rows filtered
    * map-side before the join shuffle. False positives only cost a
    * few extra shuffled rows — the exact join after the filter keeps
    * the result identical to the plain join (that plain join IS the
    * oracle). The filter is built by Spark's own `bloom_filter_agg`
    * as a scalar subquery and probed by the native runtime-filter
    * expression (`graft_might_contain` = BloomFilterMightContain):
    * everything stays inside one job and whole-stage codegen — no
    * driver-side count/collect, no UDF boxing on the fact scan. At
    * 1000 executors the 1 MiB sketch rides the subquery broadcast,
    * and the shuffle carries ~|matching lineitem| instead of
    * |lineitem|. */
  def bloomJoinPrune: Q = (s, d) => {
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("o_orderdate"))
    // 2^20 capacity / 2^23 bits = 8 bits/key (~2% fpp at capacity);
    // oversubscription degrades fpp, never correctness.
    val bf = dim
      .agg(expr("graft_bloom_agg(xxhash64(o_orderkey), 1048576L, 8388608L)").as("bf"))
      .scalar()
    val pruned = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(call_function("graft_might_contain", bf, xxhash64(col("l_orderkey"))))
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_year"))
  }

  val bloomJoinPruneSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n_lines,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
       GROUP BY 1 ORDER BY o_year"""

  /** Set-operator cohorting: customers who ordered in 1995 EXCEPT
    * 1996 (churned) vs INTERSECT (retained), counted per market
    * segment. INTERSECT/EXCEPT plan as hash aggregations + joins —
    * each input is a distinct key set, so the exchanges carry
    * |distinct customers|, not |orders|. */
  def setOps: Q = (s, d) => {
    val byYear = Tables.orders(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val y95 = byYear.filter(col("y") === 1995).select("o_custkey").distinct()
    val y96 = byYear.filter(col("y") === 1996).select("o_custkey").distinct()
    val cohorts = y95.except(y96).withColumn("cohort", lit("churned"))
      .unionByName(y95.intersect(y96).withColumn("cohort", lit("retained")))
    cohorts
      .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("cohort"), col("c_mktsegment"))
      .agg(count(lit(1)).as("customers"))
      .orderBy(col("cohort"), col("c_mktsegment"))
  }

  val setOpsSql: String =
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
            y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
            u AS (
              SELECT 'churned' AS cohort, o_custkey
              FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
              UNION ALL
              SELECT 'retained' AS cohort, o_custkey
              FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96))
       SELECT cohort, c_mktsegment, count(*) AS customers
       FROM u JOIN customer ON o_custkey = c_custkey
       GROUP BY 1, 2 ORDER BY cohort, c_mktsegment"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("bloom_join_prune", bloomJoinPrune, Some(bloomJoinPruneSql)),
    ("q_set_ops", setOps, Some(setOpsSql))
  )
}
