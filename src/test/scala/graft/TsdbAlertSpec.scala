package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-12 TSDB-lifecycle, Alertmanager-routing,
  * rank-statistics and scrape-policy families — each claim is verified
  * against an independent recomputation (driver-side fold, brute-force
  * pair join, or direct rank sort), not just the DuckDB oracle. */
class TsdbAlertSpec extends SparkTestBase {

  // ------------------------------------------------ tsdb_ooo_ingest

  test("tsdb_ooo_ingest: window decision == sequential head fold") {
    // the operator's claim: running-max-over-all == running-max-over-
    // accepted. Recompute per series with an explicitly SEQUENTIAL fold
    // that only advances the head on accepted samples.
    val got = SparkEntry.queries("tsdb_ooo_ingest")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("cast(unix_timestamp(date_trunc('second', ts)) as bigint)"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (series, rows) =>
      var head = Long.MinValue; var acc = 0L; var rej = 0L
      rows.sortBy(_._3).foreach { case (_, es, _) =>
        if (head == Long.MinValue || es >= head - 3600L) {
          acc += 1; if (es > head) head = es
        } else rej += 1
      }
      assert(got(series) == ((acc, rej)),
        s"$series: operator ${got(series)} vs sequential fold ($acc, $rej)")
    }
  }

  test("tsdb_block_plan + retention + head_chunks conserve every sample") {
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    val plan = SparkEntry.queries("tsdb_block_plan")(spark, sf).collect()
    assert(plan.map(_.getAs[Long]("total_samples")).sum == nEvents)
    // parents tile the block ids: every child range is disjoint
    val ranges = plan.map(r => (r.getAs[Long]("first_block"), r.getAs[Long]("last_block")))
    ranges.sorted.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 < s2)
      case _ =>
    }
    val ret = SparkEntry.queries("tsdb_retention")(spark, sf).collect()
    assert(ret.map(_.getAs[Long]("n_samples")).sum == nEvents)
    ret.foreach { r =>
      val del = r.getAs[String]("decision") == "delete"
      val blockEnd = (r.getAs[Long]("block_id") + 1) * 7200 - 1
      assert(del == (blockEnd < r.getAs[Long]("boundary_es")))
    }
    val hc = SparkEntry.queries("tsdb_head_chunks")(spark, sf).collect()
    assert(hc.map(_.getAs[Long]("n_samples")).sum == nEvents)
    hc.foreach { r =>
      assert(r.getAs[Long]("max_chunk_fill") <= 120L)
      assert(r.getAs[Long]("n_full_chunks") <= r.getAs[Long]("n_chunks"))
    }
  }

  // ------------------------------------------------ alert routing

  test("alert_group_wait: batch 0 is exactly the group_wait window") {
    val batches = SparkEntry.queries("alert_group_wait")(spark, sf).collect()
    // every alert is in exactly one batch: totals match the alert feed
    val nAlerts = graft.sources.Tables.events(spark, sf)
      .filter(col("value") >= 100).count()
    assert(batches.map(_.getAs[Long]("n_alerts")).sum == nAlerts)
    // flush timestamps are strictly increasing per group and start at t0+30
    batches.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val flushes = rows.sortBy(_.getAs[Long]("batch")).map(_.getAs[Long]("flush_es"))
      assert(flushes.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
    }
  }

  test("alert_inhibition: 6h-cell aggregate decision == brute-force pair join") {
    val a = graft.sources.Tables.events(spark, sf).filter(col("value") >= 100)
      .select(col("event_id"),
        expr("cast(unix_timestamp(date_trunc('second', ts)) as bigint)").as("es"),
        col("event_type").as("alertname"),
        concat(lit("u"), (col("user_id") % 10).cast("string")).as("instance"),
        (col("value") >= 200).as("crit"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    val crits = a.filter(_._5)
    val brute = a.filterNot(_._5).groupBy(w => (w._3, w._4)).map { case (k, ws) =>
      k -> ws.count(w => crits.exists(c =>
        c._3 == w._3 && c._4 == w._4 && c._2 <= w._2 && c._2 >= w._2 - 21600))
    }
    val got = SparkEntry.queries("alert_inhibition")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_inhibited")).toMap
    brute.foreach { case (k, n) =>
      assert(got(k) == n.toLong, s"key $k: operator ${got(k)} vs brute-force $n")
    }
  }

  test("alert_silence_match: regexp silence only ever matches click/view") {
    val rows = SparkEntry.queries("alert_silence_match")(spark, sf).collect()
    rows.foreach { r =>
      val name = r.getString(0)
      assert(r.getAs[Long]("n_silenced") <= r.getAs[Long]("n_alerts"))
      if (r.getAs[Long]("min_silence_id") == 2L)
        assert(name == "click" || name == "view")
    }
    assert(rows.map(_.getAs[Long]("n_alerts")).sum ==
      graft.sources.Tables.events(spark, sf).filter(col("value") >= 100).count())
  }

  test("alert_routing_tree: critical stops at A, continue fans out, totals reconcile") {
    val rows = SparkEntry.queries("alert_routing_tree")(spark, sf).collect()
    val byRecv = rows.groupBy(_.getString(0))
      .map { case (r, g) => r -> g.map(_.getAs[Long]("n_alerts")).sum }
    val a = graft.sources.Tables.events(spark, sf).filter(col("value") >= 100)
    val nCrit = a.filter(col("value") >= 200).count()
    val nWarn = a.count() - nCrit
    // route A swallows every critical exactly once (pager + pager-db)
    assert(byRecv.getOrElse("pager", 0L) + byRecv.getOrElse("pager-db", 0L) == nCrit)
    // pager-db only ever sees 'error' criticals
    rows.filter(_.getString(0) == "pager-db")
      .foreach(r => assert(r.getString(1) == "error"))
    // warnings route to B/C/default; continue=true duplicates exactly
    // the alerts matching BOTH B and C, so the receiver-row total is an
    // EXACT tiling: nWarn + |warnings matching B and C|
    val warnRows = byRecv.filterKeys(k => k != "pager" && k != "pager-db")
    val nBoth = a.filter(col("value") < 200 &&
      col("event_type").isin("click", "view") &&
      (col("user_id") % 10) === 3).count()
    assert(warnRows.values.sum == nWarn + nBoth,
      s"receiver rows ${warnRows.values.sum} must tile nWarn $nWarn + both-match $nBoth")
    assert(byRecv.contains("default") && byRecv.contains("clicks-team"))
    // clicks-team is exactly the warning click+view population (B matches
    // every warning of those names, continue cannot suppress it)
    val nClickView = a.filter(col("value") < 200 &&
      col("event_type").isin("click", "view")).count()
    assert(byRecv("clicks-team") == nClickView)
  }

  // ------------------------------------------------ rank statistics

  test("q_mann_whitney_u: rank-sum identity R1 + R2 == N(N+1)/2 on the x2 scale") {
    val r = SparkEntry.queries("q_mann_whitney_u")(spark, sf).collect().head
    val (na, nr) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_r"))
    val n = na + nr
    // recompute R1 by brute-force average ranks over the raw rows
    val vals = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_quantity").cast("int"))
      .collect().map(x => (x.getString(0), x.getInt(1)))
    val sorted = vals.map(_._2).sorted
    val rank2 = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1L).sum * 2L / g.size) } // 2*avg rank
    val r1x2 = vals.filter(_._1 == "A").map(v => rank2(v._2)).sum
    val u1x2 = r1x2 - na * (na + 1)
    assert(math.abs(r.getAs[Double]("u1_x2") - u1x2.toDouble) < 1e-6,
      s"operator u1_x2 ${r.getAs[Double]("u1_x2")} vs brute $u1x2")
    assert(n == vals.length)
  }

  test("q_kruskal_wallis: H >= 0 and group sizes cover the table") {
    val rows = SparkEntry.queries("q_kruskal_wallis")(spark, sf).collect()
    assert(rows.length == 3)
    val h = rows.map(_.getAs[Double]("h_corr")).distinct
    assert(h.length == 1 && h.head >= 0.0)
    assert(rows.map(_.getAs[Long]("n_j")).sum ==
      graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("q_bh_fdr: rejections are a contiguous rank prefix obeying the step-up bound") {
    val rows = SparkEntry.queries("q_bh_fdr")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rank"))
    val m = rows.length
    val rejected = rows.filter(_.getAs[Boolean]("rejected"))
    if (rejected.nonEmpty) {
      val k = rejected.map(_.getAs[Long]("rank")).max
      assert(rejected.map(_.getAs[Long]("rank")).toSet == (1L to k).toSet,
        "rejected set must be the prefix 1..k (step-up, not step-down)")
      // the boundary rank itself satisfies p <= k*alpha/m
      val pk = rows(k.toInt - 1).getAs[Double]("p_floor")
      assert(pk <= k.toDouble * 0.2 / m + 1e-6)
    }
  }

  test("q_cramers_v: V in [0,1] and dimensions match the contingency") {
    val r = SparkEntry.queries("q_cramers_v")(spark, sf).collect().head
    assert(r.getAs[Long]("r_levels") == 5L && r.getAs[Long]("c_levels") == 3L)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  // ------------------------------------------------ scrape policy

  test("prom_scrape_limits: a failing scrape keeps nothing") {
    SparkEntry.queries("prom_scrape_limits")(spark, sf).collect().foreach { r =>
      if (r.getAs[Long]("up") == 1L)
        assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_series"))
      else assert(r.getAs[Long]("n_kept") == 0L)
    }
  }

  test("prom_honor_labels: honoring scraped labels can only collapse cardinality") {
    val rows = SparkEntry.queries("prom_honor_labels")(spark, sf).collect()
    val byMode = rows.groupBy(_.getString(0))
      .map { case (m, rs) => m -> rs.map(_.getAs[Long]("n_series")).sum }
    assert(byMode("honor_true") <= byMode("honor_false"),
      s"honor_true ${byMode("honor_true")} must be <= honor_false ${byMode("honor_false")}")
  }

  // ------------------------------------------------ query sharding

  test("prom_query_sharding: shard legs sum exactly to the unsharded answer") {
    val rows = SparkEntry.queries("prom_query_sharding")(spark, sf).collect()
    val (totals, partials) = rows.partition(_.getAs[Long]("shard") == -1L)
    totals.foreach { t =>
      val legs = partials.filter(_.getString(0) == t.getString(0))
      assert(legs.map(_.getAs[Long]("n_samples")).sum == t.getAs[Long]("n_samples"))
      assert(legs.map(_.getAs[Long]("sum_cents")).sum == t.getAs[Long]("sum_cents"))
      assert(legs.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 4))
    }
    assert(totals.nonEmpty && partials.nonEmpty)
  }

  // ------------------------------------------------ tombstones

  test("tsdb_tombstones: click dies whole-span, conservation holds per block") {
    val rows = SparkEntry.queries("tsdb_tombstones")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_samples") ==
        r.getAs[Long]("n_tombstoned") + r.getAs[Long]("n_remaining"))
      assert(r.getAs[Boolean]("fully_deletable") ==
        (r.getAs[Long]("n_remaining") == 0L))
    }
    // the whole-span request tombstones EVERY click sample
    val nClick = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(rows.map(_.getAs[Long]("n_tombstoned")).sum >= nClick)
  }

  // ------------------------------------------------ bloom prefilter

  test("dedup_bloom_prefilter: no false negatives, positives decompose exactly") {
    val rows = SparkEntry.queries("dedup_bloom_prefilter")(spark, sf).collect()
    rows.foreach { r =>
      // a bloom filter can only over-approximate: every exact match is positive
      assert(r.getAs[Long]("n_bloom_pos") >=
        r.getAs[Long]("n_true_dup"),
        s"${r.getString(0)}: false negative — bloom missed an exact match")
      assert(r.getAs[Long]("n_bloom_pos") ==
        r.getAs[Long]("n_true_dup") + r.getAs[Long]("n_false_pos"))
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_bloom_pos"))
    }
    assert(rows.map(_.getAs[Long]("n_true_dup")).sum > 0,
      "fixture degenerate: no exact cross-corpus matches at this SF")
  }

  // ------------------------------------------------ PromQL functions

  test("prom_topk_instant: exactly <=2 per (step, job), rank order matches values") {
    val rows = SparkEntry.queries("prom_topk_instant")(spark, sf).collect()
    rows.groupBy(r => (r.getAs[Long]("step_sec"), r.getString(1))).foreach {
      case (_, g) =>
        assert(g.length <= 2)
        val sorted = g.sortBy(_.getAs[Long]("rank"))
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            val (ca, cb) = (a.getAs[Long]("cents"), b.getAs[Long]("cents"))
            assert(ca > cb || (ca == cb && a.getString(2) < b.getString(2)),
              "rank must follow (value desc, instance asc)")
          case _ =>
        }
    }
  }

  test("prom_clamp: clamp == clamp_min . clamp_max, inverted bounds yield the empty vector") {
    SparkEntry.queries("prom_clamp")(spark, sf).collect().foreach { r =>
      val (v, c, cmin, cmax) = (r.getAs[Long]("cents"), r.getAs[Long]("clamp_cents"),
        r.getAs[Long]("clamp_min_cents"), r.getAs[Long]("clamp_max_cents"))
      assert(c == math.min(math.max(v, 5000L), 20000L))
      assert(cmin == math.max(v, 5000L) && cmax == math.min(v, 20000L))
      assert(c == math.min(cmin, 20000L))
    }
    assert(graft.operators.PromQlFns.clampInverted(spark, sf).count() == 0L,
      "clamp(v, min, max) with min > max must return the EMPTY vector")
  }

  test("prom_label_join: dst overwritten, empty source leaves the bare separator") {
    val rows = SparkEntry.queries("prom_label_join")(spark, sf).collect()
    rows.foreach { r =>
      val (job, ieff, za) = (r.getString(0), r.getString(2), r.getString(4))
      assert(za == s"$job-$ieff", "zone must be the joined source labels")
      assert(r.getString(3).startsWith("z"), "pre-join zone existed and was replaced")
      if (r.getString(1) == "u0") assert(za == s"$job-",
        "empty source label joins as empty string (trailing separator kept)")
    }
  }

  test("prom_group_stdvar: group()==1 and stdvar == stddev^2 within the floor grid") {
    SparkEntry.queries("prom_group_stdvar")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("group_value") == 1L)
      val (sv, sd) = (r.getAs[Double]("stdvar"), r.getAs[Double]("stddev"))
      assert(sv >= 0 && sd >= 0)
      assert(math.abs(sd * sd - sv) <= 2 * sd * 1e-4 + 1e-4,
        s"stddev^2 ${sd * sd} must match stdvar $sv up to the 1e-4 display floor")
    }
  }

  test("prom_quantile_aggregator: bracket holds the quantile, interpolation inside it") {
    SparkEntry.queries("prom_quantile_aggregator")(spark, sf).collect().foreach { r =>
      val (lo, hi, q) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
        r.getAs[Double]("quantile_cents"))
      assert(lo <= hi, "sorted bracket")
      assert(q >= lo.toDouble - 1e-4 && q <= hi.toDouble,
        s"interpolated q $q must land in [$lo, $hi]")
      assert(r.getAs[Long]("n_series") >= 1)
    }
  }

  test("model_bradley_terry: points conserve across the tournament, bt averages 1e6") {
    val rows = SparkEntry.queries("model_bradley_terry")(spark, sf).collect()
    // every game hands out exactly 2 points across its two players
    val totPts = rows.map(_.getAs[Long]("points_x2")).sum
    val totGames = rows.map(_.getAs[Long]("n_games")).sum // each game counted twice
    assert(totPts == totGames,
      s"sum points_x2 $totPts must equal games-with-multiplicity $totGames")
    rows.foreach { r =>
      assert(r.getAs[Long]("bt_x1e6") ==
        r.getAs[Long]("points_x2") * 1000000L / r.getAs[Long]("n_games"))
    }
  }

  test("ivm_quantile_delta: chunked refcount merge recomputes the same medians") {
    import org.apache.spark.sql.functions._
    // abelian property: refcount histograms from two halves of the feed
    // merge additively to the full histogram, so the derived median is
    // chunking-independent — recompute per series on the driver
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"),
        when(get_json_object(col("props"), "$.k").cast("int") % 10 === 0, -1L)
          .otherwise(1L).as("op"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (h1, h2) = raw.sortBy(_._4).splitAt(raw.length / 2)
    def hist(rows: Array[(String, Long, Long, Long)]) =
      rows.groupBy(r => (r._1, r._2)).map { case (k, g) => k -> g.map(_._3).sum }
    val merged = (hist(h1).toSeq ++ hist(h2).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      .filter(_._2 > 0)
    val medians = merged.groupBy(_._1._1).map { case (t, cells) =>
      val sorted = cells.toSeq.map { case ((_, c), rc) => (c, rc) }.sortBy(_._1)
      val tot = sorted.map(_._2).sum
      val rank = (tot + 1) / 2
      var cum = 0L
      t -> sorted.collectFirst { case (c, rc) if { cum += rc; cum >= rank } => c }.get
    }
    val got = SparkEntry.queries("ivm_quantile_delta")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("median_cents")).toMap
    assert(got == medians, s"operator $got vs chunk-merged recompute $medians")
  }

  test("curate_dedup_mix_shift: shares tile 1e6 within floor deficit, shifts sum ~0") {
    val rows = SparkEntry.queries("curate_dedup_mix_shift")(spark, sf).collect()
    val m = rows.length
    val before = rows.map(_.getAs[Long]("share_before_x1e6")).sum
    val after = rows.map(_.getAs[Long]("share_after_x1e6")).sum
    assert(before > 1000000L - m && before <= 1000000L)
    assert(after > 1000000L - m && after <= 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("orig_tokens"))
      assert(r.getAs[Long]("shift_x1e6") ==
        r.getAs[Long]("share_after_x1e6") - r.getAs[Long]("share_before_x1e6"))
    }
  }

  // ------------------------------------------------ training prep

  test("ann_binary_quant_recall: k rows per query, overlap bounded, hamming in [0,64]") {
    val rows = SparkEntry.queries("ann_binary_quant_recall")(spark, sf).collect()
    assert(rows.length == graft.operators.BinaryQuant.NumQueries)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == graft.operators.BinaryQuant.K.toLong)
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("k"))
      assert(r.getAs[Long]("best_hamming") >= 0
        && r.getAs[Long]("worst_top_hamming") <= 64)
      assert(r.getAs[Long]("best_hamming") <= r.getAs[Long]("worst_top_hamming"))
    }
    assert(rows.map(_.getAs[Long]("n_overlap")).sum > 0,
      "sign-bit Hamming must recover SOME exact-cosine neighbors")
  }

  test("mix_doremi_step: weights monotone in loss, floor deficit bounded") {
    val rows = SparkEntry.queries("mix_doremi_step")(spark, sf).collect()
    val m = rows.length
    // exp is monotone: a higher-loss domain can never get a lower weight
    rows.sortBy(_.getAs[Long]("loss")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("w_new_x1e6") <= b.getAs[Long]("w_new_x1e6"))
      case _ =>
    }
    val total = rows.map(_.getAs[Long]("w_new_x1e6")).sum
    assert(total <= 1000000L && total > 1000000L - m,
      s"floored weights must sum into (1e6 - m, 1e6]: $total")
    rows.foreach(r => assert(r.getAs[Long]("term_u") >= 1000000L,
      "exp(x>=0) >= 1 so every term is at least the 1e6 unit"))
  }

  test("pack_fim_transform: the PSM split loses nothing") {
    val rows = SparkEntry.queries("pack_fim_transform")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("prefix_tokens") + r.getAs[Long]("middle_tokens")
        + r.getAs[Long]("suffix_tokens") == r.getAs[Long]("fim_tokens"),
        s"${r.getString(0)}: split must conserve tokens")
      assert(r.getAs[Long]("n_fim") <= r.getAs[Long]("n_docs"))
      if (r.getAs[Long]("n_fim") > 0)
        assert(r.getAs[Long]("prefix_tokens") >= r.getAs[Long]("n_fim"),
          "c1 >= 1 per transformed doc")
    }
    assert(rows.map(_.getAs[Long]("n_fim")).sum > 0, "the md5 gate selects ~half")
  }

  // ------------------------------------------------ line dedup

  test("text_line_dedup: keep-first removes exactly (occurrences - distinct) segments") {
    val rows = SparkEntry.queries("text_line_dedup")(spark, sf).collect()
    val totalSegs = rows.map(_.getAs[Long]("n_segments")).sum
    val totalRemoved = rows.map(_.getAs[Long]("n_removed")).sum
    val distinctSegs = graft.sources.Tables.documents(spark, sf)
      .select(expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
      .filter(size(col("toks")) >= 10)
      .select(explode(expr(
        """transform(sequence(0, size(toks) DIV 10 - 1),
              i -> array_join(slice(toks, i * 10 + 1, 10), ' '))""")).as("seg"))
      .distinct().count()
    assert(totalRemoved == totalSegs - distinctSegs,
      s"removed $totalRemoved vs occurrences $totalSegs - distinct $distinctSegs")
    rows.foreach(r => assert(r.getAs[Long]("kept_tokens") >= 0L))
  }

  test("dq_schema_contract: both planted violations surface, everything else is ok") {
    val v = SparkEntry.queries("dq_schema_contract")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[String]("verdict")).toMap
    assert(v("value") == "type_mismatch")
    assert(v("region") == "missing_optional")
    assert(Seq("event_id", "ts", "user_id", "event_type", "props")
      .forall(c => v(c) == "ok"), s"unexpected verdicts: $v")
    assert(!v.values.exists(_ == "missing_required"))
  }

  test("prom_queue_shards: a series never splits across shards, batches drain full-then-tail") {
    val rows = SparkEntry.queries("prom_queue_shards")(spark, sf).collect()
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_samples")).sum == nEvents)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, batches) =>
      val sorted = batches.sortBy(_.getAs[Long]("batch"))
      sorted.init.foreach(b => assert(
        b.getAs[Long]("n_samples") == graft.operators.WritePath.BatchSize.toLong,
        "only the tail batch may be partial"))
      assert(sorted.last.getAs[Long]("n_samples") <=
        graft.operators.WritePath.BatchSize.toLong)
    }
    // single-shard property: recompute each series' shard from the ONE
    // shared derivation (SeriesHash) at the operator's own constants
    import org.apache.spark.sql.functions._
    import graft.operators.{SeriesHash, WritePath}
    assert(rows.forall(r => r.getAs[Long]("shard") >= 0 &&
      r.getAs[Long]("shard") < WritePath.QueueShards))
    val nSplit = graft.sources.Tables.events(spark, sf)
      .select(SeriesHash.keyExpr.as("series_key"))
      .withColumn("shard",
        expr(SeriesHash.shardExpr("series_key", WritePath.QueueShards)))
      .groupBy(col("series_key"))
      .agg(countDistinct(col("shard")).as("n"))
      .filter(col("n") > 1).count()
    assert(nSplit == 0L, "series-hash sharding must keep each series on one shard")
  }

  test("tsdb_postings_index: intersections tile the series universe") {
    val rows = SparkEntry.queries("tsdb_postings_index")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_intersect") <= r.getAs[Long]("n_job"))
      assert(r.getAs[Long]("n_intersect") <= r.getAs[Long]("n_instance"))
      assert(r.getAs[Long]("selectivity_x1e4") >= 0
        && r.getAs[Long]("selectivity_x1e4") <= 10000)
    }
    // every (job, instance) pair partition sums back to each job's posting
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("n_intersect")).sum == g.head.getAs[Long]("n_job"))
    }
  }

  test("model_calibration: ECE is the exact event-weighted gap mean, bins decompose") {
    val rows = SparkEntry.queries("model_calibration")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n_events")).sum
    val wgap = rows.map(r => r.getAs[Long]("n_events") * r.getAs[Long]("gap_x1e6")).sum
    val ece = rows.map(_.getAs[Long]("ece_x1e6")).distinct
    assert(ece.length == 1 && ece.head == wgap / n,
      s"ece ${ece.toList} must equal the integer weighted-gap mean ${wgap / n}")
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_x1e6") ==
        math.abs(r.getAs[Long]("acc_x1e6") - r.getAs[Long]("conf_x1e6")))
      assert(r.getAs[Long]("acc_x1e6") ==
        r.getAs[Long]("n_purchases") * 1000000L / r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 9)
    }
  }

  test("text_line_dedup: position key fails loudly past the KeyBase bound") {
    import graft.operators.CurationC4
    val under = spark.sql(
      s"SELECT ${CurationC4.posKeyExpr} AS k FROM (SELECT 7L AS doc_id, " +
        s"${CurationC4.KeyBase - 1}L AS seg_idx)").collect().head.getLong(0)
    assert(under == 7L * CurationC4.KeyBase + (CurationC4.KeyBase - 1))
    val e = intercept[Exception] {
      spark.sql(s"SELECT ${CurationC4.posKeyExpr} AS k FROM (SELECT 7L AS doc_id, " +
        s"${CurationC4.KeyBase}L AS seg_idx)").collect()
    }
    assert(e.getMessage.contains("seg_idx"), s"guard must name the bound: ${e.getMessage}")
  }
}
