package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc
import graft.sources.Tables

/** Semantic invariants for the CDC apply (oracle parity is the
  * driver's gate; these check the merge semantics directly). */
class CdcSpec extends SparkTestBase {

  test("cdc_apply: tombstoned keys are gone, untouched keys keep the snapshot balance") {
    val out = Cdc.cdcApply(spark, sf).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("o").desc, col("event_id").desc)
    val lastOps = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("o"), col("event_type"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val deleted = lastOps.filter(col("event_type") === "error")
      .select(col("user_id").as("entity_key"))
    assert(out.join(deleted, Seq("entity_key")).count() == 0,
      "keys whose final log op is a delete must not survive")
    // untouched snapshot keys pass through byte-identically
    val touched = Tables.events(spark, sf).select(col("user_id").as("entity_key")).distinct()
    val untouched = out.join(touched, Seq("entity_key"), "left_anti")
    val snap = Tables.customer(spark, sf)
      .select(col("c_custkey").as("entity_key"), round(col("c_acctbal"), 2).as("snap_bal"))
    val drift = untouched.join(snap, Seq("entity_key"))
      .filter(col("balance") =!= col("snap_bal") || col("last_op") =!= "-" || col("log_ops") =!= 0)
    assert(drift.count() == 0, "untouched keys carry the snapshot forward unchanged")
    out.unpersist()
  }

  test("cdc_apply: last-writer-wins is an aggregation, not a log-wide window sort") {
    val plan = Cdc.cdcApply(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "LWW must combine map-side via max(struct), not sort a window")
  }

  test("cdc_reconcile: buckets partition both sides; drift is detected and localized") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Cdc.reconcile(spark, sf)
      .select("bucket", "n_snapshot", "digest_snapshot", "n_applied", "digest_applied",
        "in_sync")
      .as[(Int, Long, String, Long, String, Boolean)].collect()
    assert(rows.length <= Cdc.ReconcileBuckets)
    // bucket counts partition each side's keyspace
    val nSnap = graft.sources.Tables.customer(spark, sf).count()
    val nApplied = Cdc.cdcApply(spark, sf).count()
    assert(rows.map(_._2).sum == nSnap)
    assert(rows.map(_._4).sum == nApplied)
    // the CDC log really changed balances: at least one bucket drifted,
    // and in_sync is exactly the (count, digest) conjunction
    assert(rows.exists(!_._6), "expected drift between snapshot and applied state")
    rows.foreach { case (_, ns, ds, na, da, sync) =>
      assert(sync == (ns == na && ds == da))
    }
  }
}
