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

  /** One analyzed+optimized QueryExecution per non-skip entry, shared by
    * the signature snapshot and the window lint (planning 350+ entries
    * twice would double the suite's dominant cost). */
  private lazy val qes: Map[String, org.apache.spark.sql.execution.QueryExecution] =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip.contains)
      .map(n => n -> SparkEntry.queries(n)(spark, sf).queryExecution).toMap

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
        case None => name -> sig(qes(name).explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
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

  // ------------------------------------------------ window-partition lint

  /** Entries ALLOWED an unpartitioned Window whose subtree reaches a
    * table scan, each with the boundedness argument: the window's input
    * is a structurally capped frame (fixed grid carry, per-bucket seam
    * endpoints, domain-bounded aggregate), never corpus rows. An entry
    * appearing here without such an argument — or a new entry sorting
    * the corpus through one partition — is a scale bug; fix it with the
    * two-level prefix-sum idiom (`q_concurrency`, `q_abc_classification`)
    * before declaring it. Stale declarations fail too. */
  private val declaredBounded: Map[String, String] = Map(
    "cohort_lifecycle" -> "lag over the per-week actives aggregate — |weeks| rows (time domain)",
    "cohort_survival_km" -> "KM product chain over the per-tenure-day event table — ≤ observation-span days",
    "dq_benford" -> "share window over the 9-leading-digit aggregate",
    "dq_drift_psi" -> "total windows over the |PsiBuckets| decile histogram",
    "events_pareto_share" -> "cumulative over the |ParetoBuckets| decile aggregate",
    "events_stickiness" -> "day-spine prefix sum (interval decomposition) — |days| rows",
    "metrics_burn_rate" -> "6h rolling sums over the hourly rollup — |hours| rows (time domain)",
    "metrics_slo_attainment" -> "windows over the per-day attainment aggregate — |days| rows",
    "mix_anneal_schedule" -> "quality rank + largest-remainder windows over the |sources| / 2·|sources| quota table",
    "mix_budget_apportion" -> "largest-remainder rank over the |sources| quota table",
    "prom_native_histogram_sum" -> "cumulative over the ≤70 fixed exponential-ladder indices (schema-bounded)",
    "mix_dsir" -> "cross-cell carry over the ≤4097-cell weight-histogram grid (two-level prefix sum)",
    "mix_epoch_upsample" -> "max window over the |sources| rate table",
    "mix_temperature" -> "min window over the |languages| rate table",
    "pack_curriculum" -> "token-share window over the 3-phase aggregate",
    "pack_shuffle_quality" -> "seam lag over per-bucket order endpoints — ≤256 md5-prefix buckets / |sources|",
    "prom_recording_rules" -> "6h rolling max over the hourly rollup — |hours| rows (time domain)",
    "q_abc_classification" -> "cross-cell carry over the ≤4097-cell revenue grid (two-level prefix sum)",
    "q_bootstrap_ci" -> "rank over the B=64 bootstrap replicate aggregate",
    "q_bh_fdr" -> "rank + step-up windows over the |types|×|dows| cell table",
    "q_chi2_independence" -> "margin windows over the |types|×|dows| cell table",
    "ann_hnsw_levels" -> "layer-population cumsum over the ≤9-row level census aggregate",
    "dq_benford_digit2" -> "share total over the ≤10-row digit census aggregate (dq_benford shape)",
    "q_levene_bf" -> "median cumulative + totals over the ≤50-level quantity value domain (mann_whitney shape)",
    "model_auc_roc" -> "negatives-below cumulative over the |distinct cents| value-domain histogram",
    "source_backfill_chunks" -> "row-share cumulative + total over the |days|-row aggregate (time domain)",
    "sink_partition_skew" -> "size-rank + Gini windows over the |sources|-row partition aggregate",
    "events_entropy_rate" -> "rate weighting over the |types|-row per-state entropy aggregate",
    "q_friedman" -> "treatment-count window over the |event types|-row per-treatment rank aggregate",
    "tsdb_wal_replay" -> "running series total + max-segment over the |segments|-row aggregate (append-order domain)",
    "q_cramers_v" -> "margin windows over the |priorities|×|statuses| cell table",
    "q_kruskal_wallis" -> "rank prefix sum over the ≤50-level quantity value domain",
    "q_mann_whitney_u" -> "rank prefix sum over the ≤50-level quantity value domain",
    "q_concurrency" -> "cross-hour carry + spine fill over per-hour totals — |hours| rows (time domain)",
    "q_cumulative_users" -> "cumulative over per-day first-seen counts — |days| rows (time domain)",
    "q_decile_lift" -> "cumulative gains over the |LiftBuckets| decile aggregate",
    "q_ks_test" -> "two-level CDF: bucket-offset carry over the price-grid cells (value-domain bounded)",
    "q_mutual_info" -> "margin windows over the |types|×7 dow cell table",
    "q_skyline_2d" -> "strict-past min over per-price minima (value domain; range-partition merge at larger domains)",
    "q_sliding_distinct_users" -> "day-spine prefix sum (interval decomposition) — |days| rows",
    "q_sprt_abtest" -> "cumulative LLR over the per-day aggregate — |days| rows (time domain)",
    "sessionize_otsu" -> "Otsu sweep over the ≤64-row bit-length gap histogram",
    "stream_late_data" -> "256 hash-bucket rank offsets + watermark running max over the micro-batch chunk timeline",
    "stream_state_metrics" -> "256 hash-bucket rank offsets + watermark running max over the micro-batch chunk timeline",
    "text_length_survival" -> "suffix sum over the ≤64-row bit-length bucket table",
    "text_vocab_growth" -> "cumulative over the |VocabGrowthBuckets| bucket aggregate")

  test("unpartitioned windows run only over declared-bounded frames") {
    import org.apache.spark.sql.catalyst.plans.logical._
    def corpusLeafBeneath(x: LogicalPlan): Boolean = x match {
      case _: GlobalLimit | _: LocalLimit => false
      case _: Range | _: LocalRelation | _: OneRowRelation => false
      case a: Aggregate if a.groupingExpressions.isEmpty => false // 1 row
      case l: LeafNode => true
      case other => other.children.exists(corpusLeafBeneath)
    }
    val found = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip.contains)
      .flatMap { name =>
        val n = qes(name).optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty && corpusLeafBeneath(w.child) => w
        }.size
        if (n > 0) Some(name -> n) else None
      }.toMap
    val undeclared = (found.keySet -- declaredBounded.keySet).toSeq.sorted
    val stale = (declaredBounded.keySet -- found.keySet).toSeq.sorted
    assert(undeclared.isEmpty,
      s"unpartitioned Window over a scan-reaching frame in: " +
        undeclared.map(n => s"$n(${found(n)})").mkString(", ") +
        " — decompose with the two-level prefix-sum idiom or declare the bound")
    assert(stale.isEmpty,
      s"declaredBounded entries with no unpartitioned window left: ${stale.mkString(", ")}")
  }
}
