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

  test("dq rules: referential integrity holds and rules fuse into per-table passes") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Quality.dqRules(spark, sf).cache()
    assert(df.count() == 6)
    assert(df.filter(col("violations") > col("n_checked")).count() == 0)
    // the generated TPC-H-ish data is referentially intact
    val fk = df.filter(col("rule") === "orders_custkey_references_customer").collect()(0)
    assert(fk.getBoolean(fk.fieldIndex("pass")), s"FK rule should pass: $fk")
    // rule fusion: the whole suite plans only one scan per base table + the FK join
    val scans = countScans(plan("dq_rules"))
    assert(scans <= 5, s"rules over one table must share its scan, got $scans scans")
    df.unpersist()
  }

  test("PSI: buckets complete, terms non-negative-ish and total small for a stable split") {
    val df = Quality.driftPsi(spark, sf).cache()
    assert(df.count() == Quality.PsiBuckets)
    // (p-q)ln(p/q) >= 0 always (same sign factors)
    assert(df.filter(col("psi_term") < -1e-6).count() == 0)
    // all orders land in exactly one bucket
    val n = graft.sources.Tables.orders(spark, sf).count()
    assert(df.agg(sum(col("c_ref") + col("c_scr"))).head.getLong(0) == n)
    df.unpersist()
  }
}
