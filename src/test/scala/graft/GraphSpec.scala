package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkTestBase {

  test("pagerank: one score per node, floored at teleport, mass approximately conserved") {
    val df = Graph.pagerank(spark, sf).cache()
    val n = df.count()
    assert(n > 0 && df.select("node").distinct().count() == n)
    // every node receives at least the teleport mass
    val minR = df.agg(min("r")).collect()(0).getLong(0)
    assert(minR >= (15L * (1000000000000L / n)) / 100L - 1)
    // integer truncation only LOSES mass, and at most ~(100 + outdeg)
    // micro-units per node per iteration — total stays within 1% of BASE
    val total = df.agg(sum("r")).collect()(0).getLong(0)
    assert(total <= 1000000000000L && total > 990000000000L, s"total=$total")
    // hubs win: the max-degree side (suppliers, 1:15 ratio to customers)
    // must average a higher rank than customers
    val bySide = df.groupBy(substring(col("node"), 1, 1).as("side"))
      .agg(avg(col("r")).as("ar")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bySide("s") > bySide("c"), s"supplier hubs should outrank customers: $bySide")
    df.unpersist()
  }

  test("degree histogram: node total matches the graph, degrees positive") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Graph.degreeHistogram(spark, sf).cache()
    assert(df.filter(col("degree") <= 0).count() == 0)
    val totalNodes = df.agg(sum("n_nodes")).collect()(0).getLong(0)
    val ranked = graft.operators.Graph.pagerank(spark, sf).count()
    assert(totalNodes == ranked, "every ranked node has a degree bucket")
    df.unpersist()
  }
}
