package graft

import org.apache.spark.sql.functions._
import graft.operators.Models

class ModelsSpec extends SparkTestBase {

  test("model registry: walk-forward split leaks nothing and the registry is broadcast") {
    val df = Models.registryScore(spark, sf).cache()
    // every scored hour lies strictly after the 480-hour training window
    val h0 = graft.sources.Tables.events(spark, sf)
      .agg(min((floor(unix_timestamp(col("ts")) / 3600)).cast("long")).as("x0"))
      .collect()(0).getLong(0)
    val leaked = df.filter(expr("hour_sec DIV 3600") - h0 < Models.TrainHours)
    assert(leaked.count() == 0, "scored rows must be outside the training window")
    // residual algebra holds after the display floor
    assert(df.filter(abs(col("residual") - (col("avg_value") - col("predicted"))) > 1e-9)
      .count() == 0)
    // the registry side is a broadcast join — no shuffle proportional to the fact
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"registry must broadcast:\n$plan")
    // all five series trained (480 hourly points >> the 12-point minimum)
    assert(df.select("event_type").distinct().count() == 5)
    df.unpersist()
  }

  test("decile lift: partition of the population, monotone capture, lift sanity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = graft.operators.Models.decileLift(spark, sf).orderBy("decile").cache()
    val rows = df.select("decile", "n", "n_pos", "cum_n", "cum_pos", "capture", "cum_lift")
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == graft.operators.Models.LiftBuckets)
    // deciles partition the orders table
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == orders)
    assert(rows.last._4 == orders, "cum_n at decile 10 is the population")
    // positives conserved and capture monotone, ending at ~1.0
    assert(rows.map(_._3).sum == rows.last._5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._6 <= b._6, "capture is cumulative") }
    assert(math.abs(rows.last._6 - 1.0) < 1.1e-4)
    // final cumulative lift is 1 by construction (whole population)
    assert(math.abs(rows.last._7 - 1.0) < 1.1e-4)
    // per-decile counts are balanced within ties (each ~10% of population)
    assert(rows.forall(r => r._2 > 0))
    df.unpersist()
  }
}
