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
}
