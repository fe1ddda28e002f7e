package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeseriesExt
import graft.sources.Tables

class TimeseriesExtSpec extends SparkTestBase {

  test("time-weighted avg: bounded by per-day min/max of the series") {
    val df = TimeseriesExt.timeWeightedAvg(spark, sf).cache()
    assert(df.count() > 0)
    val bounds = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    // TWA is a convex combination of sample values (cents truncation
    // can undershoot the min by < 0.01)
    val bad = df.join(bounds, Seq("event_type", "day"))
      .filter(col("twa") < col("lo") - 0.01 || col("twa") > col("hi"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("MAD outliers: scores exceed k, bounded fraction of the series flagged") {
    val df = TimeseriesExt.madAnomaly(spark, sf).cache()
    assert(df.filter(col("robust_score") < TimeseriesExt.MadK).count() == 0)
    assert(df.filter(col("mad") <= 0).count() == 0)
    // MAD flags a minority: < 25% of any series (50% breakdown point)
    val perSeries = df.groupBy(col("event_type")).agg(count(lit(1)).as("n_out"))
    val sizes = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tooMany = perSeries.join(sizes, Seq("event_type"))
      .filter(col("n_out") * 4 > col("n"))
    assert(tooMany.count() == 0)
    df.unpersist()
  }

  test("histogram share: monotone in threshold, bounded by exact fractions") {
    val df = TimeseriesExt.histogramShare(spark, sf).cache()
    assert(df.filter(col("share") < 0 || col("share") > 1).count() == 0)
    // share is non-decreasing in the threshold per series
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("threshold_c"))
    assert(df.withColumn("prev", lag(col("share"), 1).over(w))
      .filter(col("prev").isNotNull && col("share") < col("prev")).count() == 0)
    // interpolated share brackets the exact CDF of the bucket bounds
    val exact = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"))
      .agg(count(when(col("v_c") <= 1000L, 1)).as("lo1000"),
        count(when(col("v_c") <= 5000L, 1)).as("hi5000"), count(lit(1)).as("cnt"))
    val bad = df.filter(col("threshold_c") === 2500L)
      .join(exact, Seq("event_type"))
      .filter(col("share") < col("lo1000") / col("cnt") - 1e-4 ||
        col("share") > col("hi5000") / col("cnt"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("lttb: endpoints kept, one point per bucket, selections are real samples") {
    val df = TimeseriesExt.downsampleLttb(spark, sf).cache()
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"),
        floor(col("value") * 100).cast("long").as("v_c"))
    // every selected point exists in the raw series
    assert(df.join(raw, Seq("event_type", "sec", "v_c"), "left_anti").count() == 0)
    // per series: n_selected = nb + 2, endpoints match raw min/max sec
    val sizes = raw.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
      min(col("sec")).as("lo"), max(col("sec")).as("hi"))
    val agg = df.groupBy(col("event_type")).agg(count(lit(1)).as("k"),
      min(col("sec")).as("slo"), max(col("sec")).as("shi"))
    assert(agg.join(sizes, Seq("event_type"))
      .filter(col("k") =!= expr(s"(n - 2 + ${TimeseriesExt.LttbK - 1}) DIV ${TimeseriesExt.LttbK} + 2"))
      .count() == 0, "one selection per bucket plus both endpoints")
    assert(agg.join(sizes, Seq("event_type"))
      .filter(col("slo") =!= col("lo") || col("shi") =!= col("hi")).count() == 0)
    // selection is strictly ordered in time per series
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("sel_idx"))
    assert(df.withColumn("prev", lag(col("sec"), 1).over(w))
      .filter(col("prev").isNotNull && col("sec") < col("prev")).count() == 0)
    df.unpersist()
  }

  test("cusum: S non-negative, resets hold, alarms a minority, recurrence verified") {
    val df = TimeseriesExt.cusumChangepoint(spark, sf).cache()
    assert(df.filter(col("s4") < 0).count() == 0)
    val n = df.count()
    val alarms = df.filter(col("alarm")).count()
    assert(alarms > 0 && alarms * 4 < n, s"alarm rate ${alarms}/$n should be a minority")
    // recurrence: s4 = max(0, prev_s4 + 2*(2*mean_c - base2) - k4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour_sec"))
    val bad = df.withColumn("prev", coalesce(lag(col("s4"), 1).over(w), lit(0L)))
      .withColumn("want",
        greatest(lit(0L), col("prev") + (col("mean_c") * 2 - col("base2")) * 2 - col("k4")))
      .filter(col("s4") =!= col("want"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("dow baseline: only scoring days flagged, deviation really exceeds half the baseline") {
    val df = TimeseriesExt.dowBaseline(spark, sf).cache()
    assert(df.filter(col("day_nr") < TimeseriesExt.BaselineTrainDays).count() == 0)
    assert(df.filter(abs(col("dev2")) * 2 <= col("base2")).count() == 0)
    assert(df.filter(col("dev2") =!= col("mean_c") * 2 - col("base2")).count() == 0)
    df.unpersist()
  }

  test("subquery max-rate: trailing max dominates the bucket's own rate") {
    val df = TimeseriesExt.subqueryMaxRate(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("max_rate") < 0).count() == 0)
    // max over a trailing window is monotone vs the single-bucket rate:
    // recompute single-bucket increases and check max_rate >= own rate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val own = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("v_c"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .withColumn("delta", col("v_c") - lag(col("v_c"), 1).over(w))
      .withColumn("inc", when(col("delta").isNull, lit(0L))
        .when(col("delta") < 0, col("v_c")).otherwise(col("delta")))
      .groupBy(col("event_type"),
        expr(s"sec DIV ${TimeseriesExt.SubRateWindowSec}").as("bucket"))
      .agg(sum(col("inc")).as("inc_c"))
      .select(col("event_type"),
        (col("bucket") * TimeseriesExt.SubRateWindowSec).as("bucket_sec"),
        (floor(col("inc_c") * lit(10000) / lit(TimeseriesExt.SubRateWindowSec)) / 1e6)
          .as("own_rate"))
    val bad = df.join(own, Seq("event_type", "bucket_sec"))
      .filter(col("max_rate") < col("own_rate"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("offset compare: ratio consistent with diff, only hours with a prior week appear") {
    val df = TimeseriesExt.offsetCompare(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("wow_diff") =!= col("mean_c") - col("prev_c")).count() == 0)
    assert(df.filter(col("wow_ratio") < 0).count() == 0)
    // diff > 0 iff ratio > 1 (floor at 4dp can't cross 1.0 for integers)
    assert(df.filter(col("wow_diff") > 0 && col("wow_ratio") < 1.0).count() == 0)
    df.unpersist()
  }

  test("top movers: at most k per day, ranked by absolute delta") {
    val df = TimeseriesExt.topMovers(spark, sf).cache()
    val perDay = df.groupBy(col("day")).agg(count(lit(1)).as("k"))
    assert(perDay.filter(col("k") > TimeseriesExt.TopMovers).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("rk"))
    assert(df.withColumn("prev_abs", lag(abs(col("delta")), 1).over(w))
      .filter(col("prev_abs").isNotNull && abs(col("delta")) > col("prev_abs"))
      .count() == 0, "absolute delta non-increasing in rank")
    df.unpersist()
  }

  test("alert feed: normalized union of the two detectors, scores positive") {
    val df = TimeseriesExt.alertFeed(spark, sf).cache()
    assert(df.filter(col("score") < 0).count() == 0)
    val byDet = df.groupBy(col("detector")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cusum = TimeseriesExt.cusumChangepoint(spark, sf)
      .filter(col("alarm")).count()
    val dow = TimeseriesExt.dowBaseline(spark, sf).count()
    assert(byDet.getOrElse("cusum_shift", 0L) == cusum)
    assert(byDet.getOrElse("dow_seasonal", 0L) == dow)
    df.unpersist()
  }

  test("gap log2 histogram: buckets really bracket powers of two") {
    val df = TimeseriesExt.gapLog2Histogram(spark, sf).cache()
    assert(df.count() > 0)
    // bucket b >= 1 holds gaps in [2^(b-1), 2^b)
    val bad = df.filter(col("bucket") >= 1 &&
      (col("lo_sec") < expr("CAST(pow(2, bucket - 1) AS BIGINT)") ||
       col("hi_sec") >= expr("CAST(pow(2, bucket) AS BIGINT)")))
    assert(bad.count() == 0)
    // every inter-arrival gap is counted exactly once
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    val events = Tables.events(spark, sf).count()
    assert(df.agg(sum(col("n"))).head.getLong(0) == events - users)
    df.unpersist()
  }

  test("seasonal decompose: components sum back exactly, seasonal centered-ish") {
    val df = TimeseriesExt.seasonalDecompose(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("mean_c") =!= col("trend_c") + col("seasonal_c") + col("residual_c"))
      .count() == 0, "additive identity must hold exactly")
    // seasonal repeats per (series, hour-of-day): 24 distinct values per series
    val perSeries = df
      .withColumn("hod", expr("(hour_sec DIV 3600) % 24"))
      .groupBy(col("event_type"), col("hod"))
      .agg(countDistinct(col("seasonal_c")).as("k"))
      .filter(col("k") =!= 1)
    assert(perSeries.count() == 0, "one seasonal value per (series, hod)")
    df.unpersist()
  }

  test("apdex: bounded in [0,1], partition counts exhaustive") {
    val df = TimeseriesExt.apdex(spark, sf).cache()
    assert(df.filter(col("apdex") < 0 || col("apdex") > 1).count() == 0)
    assert(df.filter(col("n_satisfied") + col("n_tolerating") + col("n_frustrated")
      =!= col("n")).count() == 0)
    // all-satisfied day scores 1.0 after truncation
    assert(df.filter(col("n_satisfied") === col("n") && col("apdex") < 1.0).count() == 0)
    df.unpersist()
  }
  test("staleness: every marker trails a real gap, delay fixed at 300s") {
    val df = TimeseriesExt.staleness(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("gap_sec") <= TimeseriesExt.StaleGapSec).count() == 0)
    // a marker's sample really has no successor within the gap window:
    // recompute the successor gap independently and compare counts
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("sec"), col("event_id"))
    val base = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"), col("event_id"))
    val hmax = base.agg(max("sec")).head.getLong(0)
    val want = base.withColumn("nxt", lead(col("sec"), 1).over(w))
      .filter(coalesce(col("nxt"), lit(hmax)) - col("sec") > TimeseriesExt.StaleGapSec)
      .count()
    assert(df.count() == want)
    df.unpersist()
  }

  test("exemplars: at most K per bucket, values match the referenced events") {
    val df = TimeseriesExt.exemplars(spark, sf).cache()
    assert(df.count() > 0)
    val over = df.groupBy("event_type", "bucket_start")
      .agg(count(lit(1)).as("k"))
      .filter(col("k") > TimeseriesExt.ExemplarK)
    assert(over.count() == 0)
    // every exemplar's value really is its event's value (join-back integrity)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), floor(col("value") * 100).cast("long").as("vc"))
    assert(df.join(ev, "event_id").filter(col("value_cents") =!= col("vc")).count() == 0)
    // deterministic: a second run picks the identical exemplar set
    val again = TimeseriesExt.exemplars(spark, sf).collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).sameElements(again))
    df.unpersist()
  }

}
