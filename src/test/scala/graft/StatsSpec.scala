package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends SparkTestBase {

  test("gini: bounded, conserves customer mass, and never sorts the fact table") {
    val df = Stats.giniRevenue(spark, sf).cache()
    import spark.implicits._
    val rows = df.select("n_name", "n_cust", "total_cents", "gini")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    // Gini is a proper concentration index
    rows.foreach { case (n, _, tot, g) =>
      assert(g >= 0.0 && g < 1.0, s"$n gini=$g out of range")
      assert(tot > 0)
    }
    // customers-with-orders are partitioned exactly across nations
    val custWithOrders = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum == custWithOrders)
    // the rank window runs over the aggregated customer table, not orders:
    // the plan's window sits above the o_custkey aggregation
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), "per-nation rank window expected")
    df.unpersist()
  }

  test("mann-kendall: pair count is the exact day-spine quadratic, |S| bounded") {
    val df = Stats.mannKendall(spark, sf).cache()
    import spark.implicits._
    val rows = df.select("event_type", "n_days", "n_pairs", "s_stat", "var18", "trend")
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(rows.length == 5)
    rows.foreach { case (t, n, p, s, v, tr) =>
      assert(p == n * (n - 1) / 2, s"$t pair count")
      assert(math.abs(s) <= p, s"$t S out of bounds")
      assert(v == n * (n - 1) * (2 * n + 5), s"$t variance numerator")
      assert((s > 0 && tr == "increasing") || (s < 0 && tr == "decreasing")
        || (s == 0 && tr == "flat"))
    }
    df.unpersist()
  }

  test("runs test: signs partition observations, run count bounded by observations") {
    val df = Stats.runsTest(spark, sf).cache()
    import spark.implicits._
    val rows = df.select("event_type", "n_obs", "n_pos", "n_neg", "n_runs", "expected_runs")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, p, m, r, e) =>
      assert(p + m == n, s"$t sign counts must partition the non-tie deltas")
      assert(r >= 1 && r <= n, s"$t run count out of [1, n]")
      assert(e >= 1.0 && e <= n + 1.0, s"$t expected runs out of range")
    }
    df.unpersist()
  }

  test("waterfall bridge: decomposition sums exactly to the revenue delta") {
    val df = Stats.waterfallBridge(spark, sf).cache()
    import spark.implicits._
    val rows = df
      .select("o_orderpriority", "n_a", "n_b", "cents_a", "cents_b", "delta_cents",
        "volume_effect", "price_effect")
      .as[(String, Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (pr, na, nb, ca, cb, d, ve, pe) =>
      assert(d == cb - ca)
      assert(ve + pe == d.toDouble, s"$pr bridge must reconstruct delta exactly")
      assert(na > 0 && nb > 0)
    }
    // conservation vs a direct filter
    val direct = graft.sources.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995)
      .agg(sum(floor(col("o_totalprice") * 100).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_._4).sum == direct)
    df.unpersist()
  }

  test("stats entries are deterministic under repartitioning") {
    for (name <- Seq("q_gini_revenue", "q_mann_kendall", "q_runs_test", "q_waterfall_bridge")) {
      val a = SparkEntry.queries(name)(spark, sf).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf).collect().toSeq
      assert(a == b, s"$name unstable across runs")
    }
  }
}
