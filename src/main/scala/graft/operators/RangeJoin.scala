package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join — point-in-interval matching with NO equi
  * key. Spark's native answer to `p BETWEEN s AND e` is a broadcast
  * nested-loop join (every point against every interval): fine at demo
  * scale, catastrophic at 100 TB. When interval length is bounded by L,
  * bucketing by ⌈L⌉-wide bins turns it into an EQUI join:
  *
  *   - each interval [s, e) is replicated to the ≤ 2 bins it overlaps
  *     (generated with `sequence`+`explode` — bounded fan-out L/B + 1);
  *   - each point lands in exactly ONE bin, so the equi-join on bin +
  *     residual `s <= p < e` yields every matching pair exactly once —
  *     no post-join dedup;
  *   - the join shuffles on the bin key like any aggregation — sort-
  *     merge/broadcast, AQE-planned, skew-splittable. Shuffle volume is
  *     |points| + 2|intervals|, vs |points|·|intervals| comparisons for
  *     the nested loop.
  *
  * Demo semantics: every `error` event opens a 10-minute incident
  * window; each `purchase` is tagged with how many concurrent incident
  * windows (across ALL series) it fell inside, and the earliest such
  * window's start. The oracle runs the naive BETWEEN formulation in
  * DuckDB, so the hash match proves binning loses/duplicates nothing.
  * `RangeJoinSpec` additionally pins the plan: no nested-loop join.
  */
object RangeJoin {

  type Q = (SparkSession, String) => DataFrame

  private val WinLen = 600L // seconds; also the bin width

  def rangeJoinBinned: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val wins = ev.filter(col("event_type") === "error")
      .select(unix_timestamp(col("ts")).as("w_start"))
      .withColumn("w_end", col("w_start") + WinLen)
      // [s, e) overlaps bins floor(s/B) .. floor((e-1)/B): ≤ 2 for L = B
      .withColumn("bin",
        explode(expr(s"sequence(w_start DIV $WinLen, (w_end - 1) DIV $WinLen)")))
    val pts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_timestamp(col("ts")).as("p_sec"))
      .withColumn("bin", expr(s"p_sec DIV $WinLen"))
    pts.join(wins,
        pts("bin") === wins("bin") &&
          col("p_sec") >= col("w_start") && col("p_sec") < col("w_end"),
        "left")
      .groupBy(col("event_id"), col("p_sec"))
      .agg(count(col("w_start")).as("n_windows"),
        min(col("w_start")).as("first_window_start"))
      .orderBy(col("event_id"))
  }

  val rangeJoinBinnedSql: String =
    s"""WITH wins AS (
         SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS w_start,
                CAST(epoch(date_trunc('second', ts)) AS BIGINT) + $WinLen AS w_end
         FROM events WHERE event_type = 'error'),
       pts AS (
         SELECT event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS p_sec
         FROM events WHERE event_type = 'purchase')
       SELECT p.event_id, p.p_sec,
              count(w.w_start) AS n_windows,
              min(w.w_start) AS first_window_start
       FROM pts p LEFT JOIN wins w
         ON p.p_sec >= w.w_start AND p.p_sec < w.w_end
       GROUP BY p.event_id, p.p_sec
       ORDER BY p.event_id"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("range_join_binned", rangeJoinBinned, Some(rangeJoinBinnedSql)))
}
