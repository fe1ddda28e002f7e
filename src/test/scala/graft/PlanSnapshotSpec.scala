package graft

/** Plan-shape snapshot regression: a checked-in signature (exchange /
  * broadcast / join / aggregate / scan counts) for every lazily-planned
  * entry at sf0.001. A change that silently adds a shuffle, drops a
  * broadcast, or doubles a scan fails HERE with a diff, before it costs
  * anything on a cluster. Regenerate intentionally with
  * `GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"`. */
class PlanSnapshotSpec extends SparkTestBase {

  // entries whose construction runs jobs (training, writes, sketch
  // builds) are covered by their own suites
  private val skip = Set(
    "ann_ivf_topk", "ann_ivf_tuning", "ann_ivf_stats", "ann_pq_topk", "ann_pq_packed", "dedup_cluster",
    "q_exact_global_median", "sketch_theta_distinct", "sketch_sample_quantile", "dedup_fuzzy_lsh",
    "sink_bucketed_join", "sink_bucketed_multi", "sink_partitioned_scan",
    "sink_compaction_scan", "sink_csv_roundtrip", "sink_json_roundtrip",
    "sink_zorder_scan", "sink_bucket_lookup", "sink_partition_overwrite", "source_schema_evolution", "sink_merge_on_read", "idx_secondary_lookup", "graph_pagerank", "graph_kcore", "ann_ivf_pq_topk", "sketch_set_ops",
    "graph_communities_lpa", "graph_bfs_distance", "graph_hits",
    "sink_write_audit_publish")

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
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip)
      .map(name => name -> sig(plan(name)))

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
