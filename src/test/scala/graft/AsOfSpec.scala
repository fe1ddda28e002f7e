package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin}

class AsOfSpec extends SparkTestBase {

  test("nearest as-of: dominated by both directional variants, gap minimal") {
    val near = AsOf.asofNearest(spark, sf).cache()
    assert(near.filter(col("gap_us") < 0).count() == 0)
    // wherever the backward variant matches, nearest's gap is <= backward's gap
    val back = AsOf.asofJoin(spark, sf)
      .select(col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("back_gap"))
    assert(near.join(back, Seq("event_id"))
      .filter(col("gap_us") > col("back_gap")).count() == 0)
    val fwd = AsOf.asofJoinForward(spark, sf)
      .select(col("event_id"),
        (unix_micros(col("next_click_ts")) - unix_micros(col("ts"))).as("fwd_gap"))
    assert(near.join(fwd, Seq("event_id"))
      .filter(col("gap_us") > col("fwd_gap")).count() == 0)
    // ties and one-sided cases prefer/fall back correctly: direction is
    // 'backward' whenever the backward gap equals the nearest gap
    val wrongTie = near.join(back, Seq("event_id"))
      .filter(col("gap_us") === col("back_gap") && col("direction") =!= "backward")
    assert(wrongTie.count() == 0)
    near.unpersist()
  }

  test("interval overlap join: overlaps positive and bounded by the incident hour") {
    val df = RangeJoin.intervalOverlapJoin(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("overlap_sec") < 1 || col("overlap_sec") > 3600).count() == 0)
    // every matched incident hour really exceeds the p90 error threshold
    val hourly = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .groupBy(expr("(unix_timestamp(date_trunc('second', ts)) DIV 3600) * 3600").as("incident_h"))
      .agg(count(lit(1)).as("n_err"))
    val p90 = hourly.agg(expr("percentile(n_err, 0.9e0)")).head.getDouble(0)
    assert(df.join(hourly, Seq("incident_h"))
      .filter(col("n_err") <= p90).count() == 0)
    df.unpersist()
  }
}
