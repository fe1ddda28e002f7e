package graft

import graft.operators.Similarity

/** `ann_knn_graph_ivf` — the IVF-blocked scale path for the exact kNN
  * graph: recall against brute force, edge-cosine agreement, and the
  * bounded-candidate discipline. */
class Round11bSpec extends SparkTestBase {

  test("ann_knn_graph_ivf recalls most exact neighbors and never invents cosines") {
    val exact = SparkEntry.queries("ann_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val approx = SparkEntry.queries("ann_knn_graph_ivf")(spark, sf).collect()
    assert(approx.nonEmpty)
    // ranks are 1..k, unique per vec
    val byVec = approx.groupBy(_.getLong(0))
    byVec.foreach { case (v, es) =>
      val ranks = es.map(_.getInt(4)).sorted.toList
      assert(ranks == (1 to ranks.length).toList,
        s"ranks not dense for $v: $ranks")
      assert(ranks.length <= Similarity.KnnGraphK)
    }
    // shared edges carry the identical truncated cosine (same arithmetic)
    var shared = 0
    approx.foreach { r =>
      exact.get((r.getLong(0), r.getLong(2))).foreach { c =>
        shared += 1
        assert(c == r.getDouble(3),
          s"cosine disagrees on shared edge ${(r.getLong(0), r.getLong(2))}")
      }
    }
    assert(shared > 0, "approx graph shares no edge with the exact graph")
    // recall@k: fraction of exact edges the IVF candidates recovered.
    // nprobe=2 over corpus-scaled cells on this synthetic corpus — the
    // bound is a measured floor, not a tight target
    val exactByVec = exact.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val apprByVec = approx.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exactByVec.map { case (v, nbrs) =>
      val got = apprByVec.getOrElse(v, Set.empty)
      nbrs.intersect(got).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@${Similarity.KnnGraphK} = $mean%.3f over ${recalls.size} vecs")
    assert(mean >= 0.30, f"IVF kNN-graph recall collapsed: $mean%.3f")
  }
}
