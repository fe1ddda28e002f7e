package graft

import graft.sources.Writers

/** The write-side scale promises: bucketed joins shuffle nothing,
  * partitioned reads prune directories. */
class WritersSpec extends SparkTestBase {

  test("bucketed co-located join has zero Exchange in the executed plan") {
    val df = Writers.bucketedJoin(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the join itself must be exchange-free: no repartitioning on either
    // join key anywhere (the tiny per-status agg above it may exchange)
    assert(p.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"scan should be bucket-aware:\n$p")
  }

  test("partitioned read prunes to the filtered date directories") {
    val df = Writers.partitionedScan(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), s"expected partition filters in:\n$p")
    val pf = p.substring(p.indexOf("PartitionFilters: ["))
    assert(pf.substring(0, pf.indexOf("]")).contains("event_date"),
      s"partition filter must be on event_date:\n$p")
  }

  test("multi-column bucketed pipeline joins and aggregates without shuffling the facts") {
    val df = Writers.bucketedMultiJoin(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_partkey") &&
      !p.contains("Exchange hashpartitioning(ps_partkey"),
      s"composite-key bucketed join must not shuffle its inputs:\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"scan should be bucket-aware:\n$p")
  }

  test("compaction writes the target number of contiguous files") {
    Writers.compactionScan(spark, sf).collect()
    def parts(dir: String) =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val sfx = java.lang.Integer.toHexString(sf.hashCode).takeRight(6)
    assert(parts(s"/tmp/graft_docs_small_$sfx") > Writers.CompactTargetFiles,
      "small layout should have many files")
    assert(parts(s"/tmp/graft_docs_packed_$sfx") == Writers.CompactTargetFiles,
      "compacted layout should hit the target file count")
  }

  test("approx percentiles stay within 10% of exact") {
    val rows = graft.operators.Tpch.qApproxPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ap50 = r.getDouble(1)
      val exact = r.getDouble(3)
      assert(math.abs(ap50 - exact) / math.max(math.abs(exact), 1e-9) < 0.10,
        s"ap50=$ap50 exact=$exact for ${r.getString(0)}")
    }
  }
}
