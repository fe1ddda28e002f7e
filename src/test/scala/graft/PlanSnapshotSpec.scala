package graft

/** Plan-shape snapshot regression: EVERY entry appears in the
  * checked-in ledger — either with a signature (exchange / broadcast /
  * join / aggregate / scan counts at sf0.001) or as an explicit EXEMPT
  * line carrying the reason it cannot be lazily planned. A change that
  * silently adds a shuffle, drops a broadcast, or doubles a scan fails
  * HERE with a diff, before it costs anything on a cluster; an entry
  * missing from the ledger (new, renamed, or silently dropped) also
  * fails. Regenerate intentionally with
  * `GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"`. */
class PlanSnapshotSpec extends SparkTestBase {

  // entries whose CONSTRUCTION runs Spark jobs (model training, layout
  // writes, eager checkpoints, driver-side bounds) — planning them here
  // would execute those jobs; each carries the suite that pins its
  // plan/behavior instead
  private val skip = Map(
    "ann_ivf_topk" -> "construction trains the IVF codebook (runs jobs); SimilaritySpec",
    "ann_ivf_tuning" -> "construction trains the IVF codebook (runs jobs); SimilaritySpec",
    "ann_ivf_stats" -> "construction trains the IVF codebook (runs jobs); SimilaritySpec",
    "ann_ivf_pq_topk" -> "construction trains IVF+PQ codebooks (runs jobs); SimilaritySpec",
    "ann_pq_topk" -> "construction trains the PQ codebook (runs jobs); SimilaritySpec",
    "ann_pq_packed" -> "construction trains the PQ codebook (runs jobs); SimilaritySpec",
    "dedup_semantic" -> "construction checkpoints the scaled-K assignment (runs jobs); Round10Spec",
    "emb_pca_power" -> "construction collects the bounded d-squared covariance model (runs jobs); Round10dSpec",
    "dedup_embedding_cosine" -> "construction checkpoints the probe table (runs jobs); Round10Spec",
    "ann_knn_graph_ivf" -> "construction checkpoints the IVF probe table (runs jobs); Round11bSpec",
    "prom_wire_frame_v2" -> "construction checkpoints the shared family aggregate (runs jobs); Round11dSpec",
    "dedup_cluster" -> "iterative label propagation checkpoints each round; DedupSpec",
    "dedup_fuzzy_lsh" -> "construction checkpoints the LSH candidate pairs; DedupSpec",
    "events_audience_minhash" -> "construction checkpoints the shared distinct audience set; Round11Spec",
    "q_exact_global_median" -> "construction runs the bucket-bounds pass; StatsSpec",
    "sketch_theta_distinct" -> "construction builds sketch aggregates (runs jobs); SketchSpec",
    "sketch_sample_quantile" -> "construction builds sketch aggregates (runs jobs); SketchSpec",
    "sketch_set_ops" -> "construction builds sketch aggregates (runs jobs); SketchSpec",
    "sink_bucketed_join" -> "construction writes bucketed tables; WritersSpec",
    "sink_bucketed_multi" -> "construction writes bucketed tables; WritersSpec",
    "sink_partitioned_scan" -> "construction writes the partitioned layout; WritersSpec",
    "sink_compaction_scan" -> "construction writes + compacts the layout; WritersSpec",
    "sink_csv_roundtrip" -> "construction writes the CSV sink; WritersSpec",
    "sink_json_roundtrip" -> "construction writes the JSON sink; WritersSpec",
    "sink_zorder_scan" -> "construction writes the z-ordered layout; WritersSpec",
    "sink_bucket_lookup" -> "construction builds the bucketed table + keys; WritersSpec",
    "sink_partition_overwrite" -> "construction writes + restates partitions; WritersSpec",
    "sink_merge_on_read" -> "construction writes base + tombstones; WritersSpec",
    "sink_write_audit_publish" -> "construction stages, audits and publishes; WritersSpec",
    "source_schema_evolution" -> "construction writes two schema vintages; WritersSpec",
    "idx_secondary_lookup" -> "construction builds the fact + index layouts; WritersSpec",
    "graph_pagerank" -> "iterative rank loop checkpoints each round; GraphSpec",
    "graph_kcore" -> "iterative peel loop checkpoints each round; GraphSpec",
    "graph_hits" -> "iterative hub/auth loop checkpoints each round; GraphSpec",
    "graph_communities_lpa" -> "iterative label loop checkpoints each round; GraphSpec",
    "graph_bfs_distance" -> "iterative frontier loop checkpoints each round; GraphSpec")

  private val snapFile = new java.io.File("src/test/resources/plan_signatures.txt")

  /** Count physical nodes via the formatted plan's detail section,
    * where each node appears exactly once as "(n) NodeName". */
  private def sig(p: String): String = {
    def n(node: String) = (s"""\\(\\d+\\) $node""").r.findAllIn(p).size
    Seq(
      "ex" -> n("Exchange"), // details line is "(n) Exchange"; BroadcastExchange never matches this
      "bex" -> n("BroadcastExchange"),
      "smj" -> n("SortMergeJoin"),
      "bhj" -> n("BroadcastHashJoin"),
      "shj" -> n("ShuffledHashJoin"),
      "bnlj" -> n("BroadcastNestedLoopJoin"),
      "hagg" -> n("HashAggregate"),
      "oagg" -> n("ObjectHashAggregate"),
      "sagg" -> n("SortAggregate"),
      "win" -> n("Window"),
      "scan" -> n("Scan parquet")
    ).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }

  private def current(): Seq[(String, String)] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      skip.get(name) match {
        case Some(reason) => name -> s"EXEMPT: $reason"
        case None => name -> sig(plan(name))
      }
    }

  test("physical plan signatures match the checked-in snapshot") {
    val now = current()
    if (sys.env.get("GRAFT_REGEN_PLANS").contains("1")) {
      val out = now.map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n")
      java.nio.file.Files.write(snapFile.toPath, out.getBytes("UTF-8"))
      info(s"regenerated ${now.size} signatures into $snapFile")
    } else {
      assert(snapFile.exists(),
        s"missing $snapFile — run GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanSnapshotSpec'")
      val want = scala.io.Source.fromFile(snapFile, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, s) = l.split("\t", 2); n -> s
        }.toMap
      val diffs = now.flatMap { case (name, s) =>
        want.get(name) match {
          case None => Some(s"$name: NEW ENTRY (regenerate snapshot)\n  now:  $s")
          case Some(w) if w != s => Some(s"$name: plan shape changed\n  want: $w\n  now:  $s")
          case _ => None
        }
      } ++ (want.keySet -- now.map(_._1).toSet - "" )
        .toSeq.sorted.map(n => s"$n: entry removed (regenerate snapshot)")
      assert(diffs.isEmpty, diffs.mkString("\n"))
    }
  }
}
