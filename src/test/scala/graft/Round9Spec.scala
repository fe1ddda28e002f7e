package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: native-histogram reads. */
class Round9Spec extends SparkTestBase {

  test("native histogram: sparse buckets conserve mass and stay within the schema-2 grid") {
    val down = SparkEntry.queries("prom_native_histogram_downscale")(spark, sf)
      .collect()
    val total = down.map(_.getAs[Long]("cnt")).sum
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(total == events, "downscaled bucket masses must sum to the event count")
    // schema-0 indices cover (2^(i-1), 2^i]: the domain (0.01, 500] fits in [-6, 9]
    val idxs = down.map(_.getAs[Int]("bucket_idx"))
    assert(idxs.min >= -7 && idxs.max <= 10, s"indices out of domain: ${idxs.min}..${idxs.max}")
    // merging 4:1 can only shrink the bucket count, never below 1/4
    down.foreach { r =>
      val m = r.getAs[Long]("n_merged")
      assert(m >= 1 && m <= 4, s"schema 2->0 merges at most 4 source buckets, got $m")
    }
  }

  test("native histogram_quantile tracks exact percentiles within one bucket width (19%)") {
    val est = SparkEntry.queries("prom_native_histogram_quantile")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("e50"),
        expr("percentile(value, 0.9)").as("e90"),
        expr("percentile(value, 0.99)").as("e99"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(est.nonEmpty && est.keySet == exact.keySet)
    // a schema-2 bucket spans a 2^0.25 ≈ 1.19 ratio: the estimator can
    // be off by at most one bucket width (plus interpolation slack)
    for ((et, r) <- est; (q, e) <- Seq("p50" -> "e50", "p90" -> "e90", "p99" -> "e99")) {
      val got = r.getAs[Double](q)
      val ex = exact(et).getAs[Double](e)
      assert(got > ex / 1.3 && got < ex * 1.3,
        s"$et $q: native-histogram estimate $got vs exact $ex")
    }
    // sparsity: the per-series histogram stores only hit buckets
    est.values.foreach { r =>
      assert(r.getAs[Long]("n_buckets") <= 69, "sparse bucket set must stay domain-bounded")
    }
  }

  test("graft_lttb kernel picks the hand-computable points on a tiny series") {
    import spark.implicits._
    // 8 points, k=3 → first + 2 interior buckets + last.
    // pts sorted by sec; values chosen so the largest-triangle pick is
    // unambiguous: bucket 1 = secs 1..3, bucket 2 = secs 4..6 (anchor
    // for b1 is b2's centroid; anchor for b2 is the final point).
    val pts = Seq(
      (0L, 0L, 10L), (1L, 1L, 10L), (2L, 2L, 90L), (3L, 3L, 10L),
      (4L, 4L, 10L), (5L, 5L, 5L), (6L, 6L, 80L), (7L, 7L, 20L))
    val df = pts.toDF("sec", "event_id", "v_c")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct($"sec", $"event_id", $"v_c"))).as("pts"))
      .selectExpr("inline(graft_lttb(pts, 3))")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // first and last always kept; sec=2 (v=90) dominates bucket 1.
    // bucket 2 anchors on prev pick (2,90) and the final point (7,20):
    // areas are |(2-7)(v-90) - (2-s)(20-90)| = 260 / 215 / 230 for
    // s=4,5,6 — the deep DIP at (4,10) wins, not the (6,80) spike
    // (largest-triangle, not largest-value)
    assert(got == Seq((0L, 10L), (2L, 90L), (4L, 10L), (7L, 20L)), s"got $got")
  }

  test("graft_lttb output length is exact: first + ceil((n-2)/k) picks + last") {
    import spark.implicits._
    for (n <- Seq(3, 4, 7, 10, 23); k <- Seq(2, 3, 7)) {
      val pts = (0 until n).map(i => (i.toLong, i.toLong, (i * 37 % 101).toLong))
      val cnt = pts.toDF("sec", "event_id", "v_c")
        .agg(org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct($"sec", $"event_id", $"v_c"))).as("pts"))
        .selectExpr(s"size(graft_lttb(pts, $k)) AS m")
        .head().getInt(0)
      assert(cnt == 2 + (n - 2 + k - 1) / k, s"n=$n k=$k -> $cnt")
    }
  }
}
