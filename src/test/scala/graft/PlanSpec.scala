package graft

/** Plan-shape assertions: the promises SURVEY.md §5 makes about scale
  * behavior, checked against the actual Catalyst physical plans. */
class PlanSpec extends SparkTestBase {

  test("q6 pushes filters into the parquet scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("l_shipdate"), "shipdate filter should reach the scan")
  }

  test("q6 prunes columns at the scan (ReadSchema subset)") {
    val p = plan("q6_forecast_revenue")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey"), s"unneeded column read: $read")
    assert(read.contains("l_extendedprice"))
  }

  test("q5 broadcasts dimension tables") {
    val p = plan("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), "dims should broadcast")
  }

  test("q1 aggregates with map-side partial aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"))
    // partial + final pair implies map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("whole-stage codegen covers the q1 pipeline") {
    val p = executedPlan("q1_pricing_summary")
    assert(p.contains("codegen id"), s"no codegen spans in final plan:\n${p.take(1500)}")
  }

  test("asof_join is a single exchange (union+window, no range join)") {
    val p = plan("asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "asof must not fall back to a product join")
    val exchanges = countNodes(p, "Exchange")
    assert(exchanges <= 2, s"expected <=2 exchanges, plan had $exchanges:\n${p.take(1500)}")
  }

  test("ann_bruteforce broadcasts the query side") {
    val p = plan("ann_bruteforce_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_ngram_jaccard has no cross join anywhere") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
  }
}
