package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the round-8 additions — properties the
  * hash oracle can't express (recall bounds, incremental ≡ full
  * restriction, monotone growth curves). */
class Round8Spec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ann_recall_eval: recall is a proper fraction of the exact top-k") {
    import spark.implicits._
    val rows = run("ann_recall_eval")
      .select("query_id", "n_truth", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == graft.operators.Similarity.NumQueries)
    rows.foreach { case (q, nt, nh, r) =>
      assert(nt == graft.operators.Similarity.TopK, s"q$q truth size")
      assert(nh >= 0 && nh <= nt, s"q$q hits out of range")
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs(r - math.floor(nh.toDouble / nt * 1e4) / 1e4) < 1e-12)
    }
    // the multi-table LSH index should not be useless on this corpus
    assert(rows.map(_._3).sum > 0, "zero total recall — index broken")
  }

  test("dedup_incremental: delta-only probe equals the full pipeline restricted to delta") {
    import spark.implicits._
    val inc = run("dedup_incremental").cache()
    // every reported doc is a delta member by the content-hash rule
    val deltaDocs = graft.sources.Tables.documents(spark, sf)
      .filter(substring(md5(col("text")), 1, 1)
        .isin(graft.operators.Dedup.IncDeltaHex: _*))
      .select("doc_id")
    assert(inc.join(deltaDocs, Seq("doc_id"), "left_anti").count() == 0)
    // a 'dup' row must name a real partner with jaccard ≥ 0.4;
    // a 'unique' row must carry the sentinels
    assert(inc.filter(col("status") === "dup" &&
      (col("best_partner") < 0 || col("best_jaccard") < 0.4)).count() == 0)
    assert(inc.filter(col("status") === "unique" &&
      (col("best_partner") =!= -1L || col("best_jaccard") =!= 0.0 ||
        col("n_dups") =!= 0L)).count() == 0)
    // cross-check against the FULL minhash pair list: a delta doc is
    // 'dup' iff it appears in some full-pipeline pair (either side)
    val pairs = run("dedup_minhash_lsh")
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    val full = deltaDocs.join(pairs, Seq("doc_id")).as[Long].collect().toSet
    val mine = inc.filter(col("status") === "dup").select("doc_id").as[Long].collect().toSet
    assert(mine == full, s"incremental dup set ${mine.size} != full-restricted ${full.size}")
    inc.unpersist()
  }

  test("text_vocab_growth: buckets partition occurrences, growth curve is monotone") {
    import spark.implicits._
    val rows = run("text_vocab_growth")
      .select("bucket", "n_occ", "new_types", "cum_occ", "cum_types")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= graft.operators.TextAnalysis.VocabGrowthBuckets)
    // cumulative columns really are the running sums
    assert(rows.map(_._2).sum == rows.last._4)
    assert(rows.map(_._3).sum == rows.last._5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 > a._1 && b._4 > a._4 && b._5 >= a._5)
    case _ => ()
    }
    // total distinct types equals the corpus-wide distinct bigram count
    val distinctBigrams = graft.sources.Tables.documents(spark, sf)
      .select(expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("b")).distinct().count()
    assert(rows.last._5 == distinctBigrams)
  }
}
