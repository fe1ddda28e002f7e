package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkTestBase {

  test("range_join_binned: equi-join plan — no nested-loop, no cartesian") {
    val plan = RangeJoin.rangeJoinBinned(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binning must turn the range join into an equi join:\n$plan")
  }

  test("range_join_binned: matches the naive BETWEEN join exactly (no lost or duplicated pairs)") {
    val ev = Tables.events(spark, sf)
    val wins = ev.filter(col("event_type") === "error")
      .select(unix_timestamp(col("ts")).as("w_start"))
      .withColumn("w_end", col("w_start") + 600L)
    val pts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_timestamp(col("ts")).as("p_sec"))
    val naive = pts.join(wins,
        col("p_sec") >= col("w_start") && col("p_sec") < col("w_end"), "left")
      .groupBy(col("event_id"), col("p_sec"))
      .agg(count(col("w_start")).as("n_windows"),
        min(col("w_start")).as("first_window_start"))
    val binned = RangeJoin.rangeJoinBinned(spark, sf)
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
    // the demo data actually exercises the match path
    assert(binned.filter(col("n_windows") >= 1).count() > 0)
  }
}
