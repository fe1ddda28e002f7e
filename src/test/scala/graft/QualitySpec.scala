package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkTestBase {

  test("dq_profile: all per-column metrics come from ONE scan of the fact table") {
    val plan = Quality.dqProfile(spark, sf).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single lineitem scan, got $scans:\n$plan")
  }

  test("dq_profile: metric sanity — bounds ordered, distincts bounded by rows") {
    val df = Quality.dqProfile(spark, sf).cache()
    assert(df.count() == 7)
    assert(df.filter(col("n_distinct") > col("n_rows") - col("n_nulls")).count() == 0)
    assert(df.filter(col("num_min") > col("num_max")).count() == 0)
    assert(df.filter(col("len_min") > col("len_max")).count() == 0)
    // every row carries exactly one of (numeric range | length range)
    assert(df.filter(col("num_min").isNotNull && col("len_min").isNotNull).count() == 0)
    assert(df.filter(col("num_min").isNull && col("len_min").isNull).count() == 0)
    df.unpersist()
  }
}
