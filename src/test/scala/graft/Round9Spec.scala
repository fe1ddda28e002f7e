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
}
