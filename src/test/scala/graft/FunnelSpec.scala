package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {

  test("funnel: stage times are ordered and stage k implies stage k-1") {
    val df = Funnel.funnelStages(spark, sf).cache()
    assert(df.filter(col("stage") >= 2 && col("first_qual_click") < col("first_view")).count() == 0)
    assert(df.filter(col("stage") === 3 &&
      col("first_qual_purchase") < col("first_qual_click")).count() == 0)
    assert(df.filter(col("stage") >= 2 && col("first_view").isNull).count() == 0)
    assert(df.filter(col("stage") === 3 && col("first_qual_click").isNull).count() == 0)
    // the funnel narrows (weakly) stage over stage
    val counts = (1 to 3).map(k => df.filter(col("stage") >= k).count())
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    df.unpersist()
  }

  test("funnel: one entity-keyed shuffle feeds both window passes and the aggregation") {
    val plan = Funnel.funnelStages(spark, sf).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected a single user_id shuffle, got $shuffles")
  }

  test("attribution: every purchase appears once; credit is 1/n_touches") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Funnel.attributionLinear(spark, sf).cache()
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == purchases)
    assert(df.filter(col("n_touches") === 0 && col("credit_per_touch").isNotNull).count() == 0)
    assert(df.filter(col("n_touches") > 0 &&
      abs(col("credit_per_touch") * col("n_touches") - 1.0) > 0.01).count() == 0)
    df.unpersist()
  }

  test("top paths: exactly 10 ranked paths; user counts bounded by occurrences") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Funnel.topPaths(spark, sf).cache()
    assert(df.count() == 10)
    assert(df.filter(col("n_users") > col("n")).count() == 0)
    val rks = df.select("rk").collect().map(_.getInt(0)).sorted.toSeq
    assert(rks == (1 to 10), s"ranks must be dense: $rks")
    df.unpersist()
  }
  test("position attribution: credits always total exactly 10000 bp") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Funnel.attributionPosition(spark, sf).cache()
    val attributed = df.filter(col("n_touches") > 0)
    assert(attributed.count() > 0)
    val bad = attributed.filter(
      col("first_bp") + col("last_bp")
        + col("mid_each_bp") * greatest(col("n_touches") - 2, lit(0L)) =!= 10000L)
    assert(bad.count() == 0, "U-shaped credit must be conservative")
    assert(df.filter(col("n_touches") === 0 && col("first_bp").isNotNull).count() == 0)
    df.unpersist()
  }

}
