package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cohort, Quality}

class CohortSpec extends SparkTestBase {

  test("cohort matrix: offset 0 holds the full cohort; no cell exceeds it") {
    val df = Cohort.cohortRetention(spark, sf).cache()
    assert(df.filter(col("month_offset") < 0).count() == 0)
    val base = df.filter(col("month_offset") === 0)
      .select(col("cohort_m"), col("n_active").as("cohort_size"))
    // every cohort has an offset-0 cell (its birth month)
    assert(base.count() == df.select("cohort_m").distinct().count())
    val over = df.join(base, Seq("cohort_m"))
      .filter(col("n_active") > col("cohort_size"))
    assert(over.count() == 0, "no month can retain more customers than the cohort has")
    df.unpersist()
  }

  test("decimal money: exact fixed-point totals agree with the double estimate to the cent") {
    val rows = Quality.decimalMoney(spark, sf).collect()
    assert(rows.length == 6)
    val approx = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(round(col("l_extendedprice"), 2) * round(lit(1) - col("l_discount"), 2)).as("a"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val exact = BigDecimal(r.getString(2))
      val est = approx((r.getString(0), r.getString(1)))
      assert((exact - est).abs < 0.01, s"decimal $exact vs double $est")
    }
  }
}
