package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the "what did I just ingest" read every
  * pipeline runs before trusting a table. The reference's collector
  * health-checks its sources per scrape (connection up, rows returned);
  * an engine that OWNS the tables profiles them: per-column null
  * counts, exact distinct cardinalities, numeric ranges, string length
  * bounds.
  *
  * Scale design (100 TB): ONE pass over the fact table. All per-column
  * metrics live in a single Aggregate; the multiple COUNT(DISTINCT)s
  * plan through Catalyst's Expand (|cols|× row expansion feeding one
  * shuffle of partial states) — still one scan, no per-column rescans.
  * The final unpivot is a `stack` over the single result row: driver
  * cost is |cols|, zero extra jobs. At petabyte scale you'd swap the
  * exact distincts for `graft_theta` sketches (same shape, mergeable,
  * no Expand) — the exact form is kept here because it is
  * oracle-checkable bit-for-bit; `sketch_theta_distinct` carries the
  * sketch variant's contract.
  */
object Quality {

  type Q = (SparkSession, String) => DataFrame

  private sealed trait Kind
  private case object Num extends Kind
  private case object Str extends Kind
  private case object Ts  extends Kind

  private val profiled: Seq[(String, Kind)] = Seq(
    "l_orderkey" -> Num, "l_quantity" -> Num, "l_extendedprice" -> Num,
    "l_discount" -> Num, "l_returnflag" -> Str, "l_shipdate" -> Ts,
    "l_linestatus" -> Str)

  def dqProfile: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n")) ++ profiled.flatMap { case (c, kind) =>
      val base = Seq(
        count(when(col(c).isNull, 1)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
      val range = kind match {
        case Num => Seq(round(min(col(c)), 2).cast("double").as(s"mn_$c"),
          round(max(col(c)), 2).cast("double").as(s"mx_$c"))
        case Ts => Seq(min(unix_timestamp(col(c))).cast("double").as(s"mn_$c"),
          max(unix_timestamp(col(c))).cast("double").as(s"mx_$c"))
        case Str => Seq(min(length(col(c))).cast("int").as(s"ln_$c"),
          max(length(col(c))).cast("int").as(s"lx_$c"))
      }
      base ++ range
    }
    val rows: Seq[Column] = profiled.map { case (c, kind) =>
      val (mn, mx, ln, lx) = kind match {
        case Str => (lit(null).cast("double"), lit(null).cast("double"),
          col(s"ln_$c"), col(s"lx_$c"))
        case _ => (col(s"mn_$c"), col(s"mx_$c"),
          lit(null).cast("int"), lit(null).cast("int"))
      }
      struct(lit(c).as("col_name"), col("n").as("n_rows"),
        col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        mn.as("num_min"), mx.as("num_max"), ln.as("len_min"), lx.as("len_max"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  val dqProfileSql: String = {
    val aggs = profiled.flatMap { case (c, kind) =>
      val base = Seq(
        s"count(*) FILTER (WHERE $c IS NULL) AS nn_$c",
        s"count(DISTINCT $c) AS nd_$c")
      val range = kind match {
        case Num => Seq(s"CAST(round(min($c), 2) AS DOUBLE) AS mn_$c",
          s"CAST(round(max($c), 2) AS DOUBLE) AS mx_$c")
        case Ts => Seq(s"CAST(epoch(date_trunc('second', min($c))) AS DOUBLE) AS mn_$c",
          s"CAST(epoch(date_trunc('second', max($c))) AS DOUBLE) AS mx_$c")
        case Str => Seq(s"CAST(min(length($c)) AS INT) AS ln_$c",
          s"CAST(max(length($c)) AS INT) AS lx_$c")
      }
      base ++ range
    }
    val rows = profiled.map { case (c, kind) =>
      val (mn, mx, ln, lx) = kind match {
        case Str => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"ln_$c", s"lx_$c")
        case _   => (s"mn_$c", s"mx_$c", "CAST(NULL AS INT)", "CAST(NULL AS INT)")
      }
      s"""SELECT '$c' AS col_name, n AS n_rows, nn_$c AS n_nulls, nd_$c AS n_distinct,
                 $mn AS num_min, $mx AS num_max, $ln AS len_min, $lx AS len_max FROM a"""
    }
    s"""WITH a AS (SELECT count(*) AS n, ${aggs.mkString(", ")} FROM lineitem)
       SELECT * FROM (${rows.mkString(" UNION ALL ")}) t ORDER BY col_name"""
  }

  /** Exact DECIMAL money arithmetic — the financial-reporting
    * contract: revenue aggregated in fixed-point, where no summation
    * order can perturb a cent. Doubles are rounded to their 2-decimal
    * face value ONCE (the same IEEE double rounds the same way in any
    * engine), then every multiply/sum runs in decimal — Spark's sum of
    * DECIMAL is exact (overflow-checked), so this is the query shape
    * to hand an auditor, vs the floor-truncation contracts the float
    * entries declare. Output serialized at scale 4 so both engines
    * print the identical fixed-point literal. */
  def decimalMoney: Q = (s, d) => {
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        (round(col("l_extendedprice"), 2).cast("decimal(14,2)") *
          round(lit(1) - col("l_discount"), 2).cast("decimal(5,2)")).as("net"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("net")).as("rev"), count(lit(1)).as("n_lines"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("rev").cast("decimal(28,4)").cast("string").as("revenue"),
        col("n_lines"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val decimalMoneySql: String =
    """SELECT l_returnflag, l_linestatus,
              CAST(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(14,2))
                            * CAST(round(1 - l_discount, 2) AS DECIMAL(5,2)))
                   AS DECIMAL(28,4)) AS VARCHAR) AS revenue,
              count(*) AS n_lines
       FROM lineitem
       GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("dq_profile", dqProfile, Some(dqProfileSql)),
    ("q_decimal_money", decimalMoney, Some(decimalMoneySql)))
}
