package graft

/** Round-8 check (VERDICT item 6): mm_aspect_bucket must prune the
  * binary payload (no encode(text) in its scan) and fold meta()'s
  * inherited orderBy out of the composed plan. */
class AspectPlanCheck extends SparkTestBase {
  test("mm_aspect_bucket prunes payload and drops inherited sort") {
    val qe = SparkEntry.queries("mm_aspect_bucket")(spark, sf).queryExecution
    val formatted = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val reads = "ReadSchema: \\S+".r.findAllIn(formatted).toSeq
    info(reads.mkString("\n"))
    assert(!formatted.contains("encode("), "payload encode must be pruned")
    val sorts = "\\(\\d+\\) Sort".r.findAllIn(qe.executedPlan.toString).size
    info(s"sort nodes: $sorts")
  }
}
