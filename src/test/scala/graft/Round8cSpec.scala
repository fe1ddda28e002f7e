package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the third round-8 session's additions —
  * properties the hash oracle can't express (SQ8 recall vs exact,
  * bootstrap coverage, allocation budgets, rollup conservation). */
class Round8cSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ann_sq8_topk: full result panel, ascending integer distances, nonzero exact overlap") {
    import spark.implicits._
    val rows = run("ann_sq8_topk")
      .select("query_id", "neighbor_id", "sq_dist", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val k = graft.operators.Similarity.TopK
    assert(rows.length == graft.operators.Similarity.NumQueries * k)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to k), s"q$q ranks")
      val byRank = rs.sortBy(_._4)
      assert(byRank.sliding(2).forall(p => p(0)._3 <= p(1)._3), s"q$q distances not ascending")
      assert(rs.forall(_._3 >= 0), s"q$q negative distance")
      assert(rs.forall(_._2 != q), s"q$q returned itself")
    }
    // the 8-bit quantizer must agree with the exact index on a decent share
    val truth = run("ann_bruteforce_topk").select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val overlap = rows.map(r => (r._1, r._2)).count(truth)
    assert(overlap >= truth.size / 2, s"SQ8 recall too low: $overlap/${truth.size}")
  }

  test("q_bootstrap_ci: replicate panel is complete and the CI ranks bracket the middle") {
    import spark.implicits._
    val rows = run("q_bootstrap_ci")
      .select("b", "n_eff", "mean_cents", "rank", "is_ci_lo", "is_ci_hi")
      .as[(Int, Long, Double, Int, Boolean, Boolean)].collect()
    val B = graft.operators.Stats.BootB
    assert(rows.length == B)
    assert(rows.map(_._4).sorted.toSeq == (1 to B), "ranks are not a permutation")
    assert(rows.count(_._5) == 1 && rows.count(_._6) == 1)
    val byRank = rows.sortBy(_._4)
    assert(byRank.sliding(2).forall(p => p(0)._3 <= p(1)._3), "means not ascending in rank")
    val lo = rows.find(_._5).get._3; val hi = rows.find(_._6).get._3
    assert(lo <= hi)
    // Poisson(1) replicate sizes concentrate around n
    val n = graft.sources.Tables.orders(spark, sf).count()
    rows.foreach { case (b, nEff, _, _, _, _) =>
      assert(math.abs(nEff - n) < 6 * math.sqrt(n.toDouble) + 10, s"replicate $b size $nEff vs $n")
    }
  }

  test("q_welch_ttest: every type pair once; t sign follows the mean gap; df in Welch bounds") {
    import spark.implicits._
    val rows = run("q_welch_ttest")
      .select("type_a", "type_b", "n_a", "n_b", "mean_a", "mean_b", "t_welch", "df_welch")
      .as[(String, String, Long, Long, Double, Double, Double, Double)].collect()
    val nTypes = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().count().toInt
    assert(rows.length == nTypes * (nTypes - 1) / 2)
    rows.foreach { case (a, b, na, nb, ma, mb, t, df) =>
      assert(a < b)
      if (math.abs(ma - mb) > 1e-3)
        assert(math.signum(t) == math.signum(ma - mb), s"($a,$b) t sign")
      assert(df >= math.min(na, nb) - 1 - 1e-9, s"($a,$b) df below min(n)-1")
      assert(df <= na + nb - 2 + 1e-9, s"($a,$b) df above pooled")
    }
  }

  test("text_char_entropy: classes partition the chars; H within [0, ln 5]") {
    import spark.implicits._
    val rows = run("text_char_entropy")
      .select("n", "c_lower", "c_upper", "c_digit", "c_space", "c_other", "entropy")
      .as[(Int, Int, Int, Int, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, cl, cu, cd, cs, co, h) =>
      assert(cl + cu + cd + cs + co == n, "class counts don't partition")
      assert(co >= 0, "negative other-class count")
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-9, s"entropy $h out of range")
    }
  }

  test("prom_scrape_health: one global spine; up, flap and run bounds hold") {
    import spark.implicits._
    val rows = run("prom_scrape_health")
      .select("event_type", "n_slots", "n_up", "availability", "n_flaps", "longest_down_hours")
      .as[(String, Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).distinct.length == 1, "targets disagree on the global slot count")
    rows.foreach { case (t, slots, up, avail, flaps, ldh) =>
      assert(up >= 0 && up <= slots, s"$t up count")
      assert(math.abs(avail - math.floor(up.toDouble / slots * 1e4) / 1e4) < 1e-12)
      assert(flaps < slots, s"$t flaps")
      assert(ldh <= slots - up, s"$t longest down run exceeds total downtime")
      assert((ldh == 0) == (up == slots), s"$t down-run/availability mismatch")
    }
  }

  test("split_grouped: source-keyed split provably leaks zero sources; doc counts conserve") {
    import spark.implicits._
    val rows = run("split_grouped")
      .select("strategy", "split", "n_docs", "n_sources", "n_leaked_sources")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.length == 4)
    val total = graft.sources.Tables.documents(spark, sf).count()
    Seq("by_doc", "by_source").foreach { st =>
      val arm = rows.filter(_._1 == st)
      assert(arm.map(_._3).sum == total, s"$st docs don't conserve")
    }
    assert(rows.filter(_._1 == "by_source").forall(_._5 == 0), "source split leaked a source")
    // doc-keyed split scatters at least one source across both sides here
    assert(rows.filter(_._1 == "by_doc").forall(_._5 > 0), "by_doc unexpectedly leak-free")
  }

  test("sample_neyman: allocations respect the budget and integer-mass proportionality") {
    import spark.implicits._
    val rows = run("sample_neyman")
      .select("source", "n", "mass", "neyman_alloc", "prop_alloc")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val budget = graft.operators.Pipeline.NeymanBudget
    assert(rows.map(_._4).sum <= budget, "Neyman allocation over budget")
    assert(rows.map(_._5).sum <= budget, "proportional allocation over budget")
    assert(rows.forall(r => r._4 >= 0 && r._5 >= 0))
    // floor-share monotonicity: more mass never gets fewer slots
    val byMass = rows.sortBy(_._3)
    assert(byMass.sliding(2).forall(p => p(0)._4 <= p(1)._4), "allocation not monotone in mass")
  }

  test("q_hierarchy_rollup: root conserves the corpus; every subtree bounds its own part") {
    import spark.implicits._
    val rows = run("q_hierarchy_rollup")
      .select("node", "depth", "n_desc", "subtree_cents", "own_cents")
      .as[(Long, Int, Long, Long, Long)].collect()
    val parts = graft.sources.Tables.part(spark, sf)
      .select(floor(col("p_retailprice") * 100).cast("long").as("c"))
      .agg(sum("c"), count(lit(1))).as[(Long, Long)].collect().head
    val root = rows.find(_._1 == 0L).get
    assert(root._4 == parts._1, "root subtree != corpus total")
    assert(root._3 == parts._2, "root descendant count != part count")
    val byNode = rows.map(r => r._1 -> r).toMap
    rows.filter(_._1 > 0).foreach { r =>
      val parent = byNode(r._1 / 10)
      assert(parent._4 >= r._4, s"parent of ${r._1} smaller subtree")
      assert(parent._3 >= r._3, s"parent of ${r._1} fewer descendants")
      assert(r._4 >= r._5, s"node ${r._1} subtree below own value")
    }
  }

  test("q_winsorized_mean: bounds ordered, winsorized mean clamped inside them") {
    import spark.implicits._
    val rows = run("q_winsorized_mean")
      .select("l_returnflag", "n", "p05_cents", "p95_cents", "mean_cents", "winsor_mean_cents")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, n, lo, hi, _, wm) =>
      assert(n > 0)
      assert(lo <= hi, s"$f bounds out of order")
      assert(wm >= lo - 1e-9 && wm <= hi + 1e-9, s"$f winsorized mean outside clamp range")
    }
  }
}
