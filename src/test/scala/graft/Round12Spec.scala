package graft

import graft.operators.PromWire

/** Round-12 pins: the UTF-8 byte-length fix in the protobuf length
  * prefixes. Both engines previously computed `length()` — a CHARACTER
  * count — for the label/symbol length prefixes while the payload hex
  * was UTF-8 bytes, so any non-ASCII event_type produced an invalid
  * wire body that the DuckDB oracle (computing the same wrong bytes)
  * could never catch. The encoder now derives every data-string prefix
  * from `length(hex(col)) div 2` (hex is bytewise and pure ASCII in
  * both engines); this spec feeds multi-byte label values through the
  * REAL v1 encode path and round-trips them with the independent
  * protobuf decoder from PromWireSpec. */
class Round12Spec extends SparkTestBase {

  // minimal independent decoder (same as PromWireSpec's — duplicated on
  // purpose: each wire spec must stand alone against the public format)
  private case class Field(num: Int, wireType: Int, varint: Long, bytes: Array[Byte])
  private def readVarint(b: Array[Byte], p: Int): (Long, Int) = {
    var x = 0L; var shift = 0; var i = p
    while ({ val c = b(i); x |= (c & 0x7fL) << shift; shift += 7; i += 1; (c & 0x80) != 0 }) ()
    (x, i)
  }
  private def fields(b: Array[Byte]): Seq[Field] = {
    var p = 0; val out = Seq.newBuilder[Field]
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      val num = (tag >> 3).toInt; val wt = (tag & 7).toInt
      wt match {
        case 0 => val (v, p2) = readVarint(b, p1); out += Field(num, wt, v, Array.empty); p = p2
        case 1 =>
          var v = 0L
          for (i <- 0 until 8) v |= (b(p1 + i) & 0xffL) << (8 * i)
          out += Field(num, wt, v, b.slice(p1, p1 + 8)); p = p1 + 8
        case 2 => val (len, p2) = readVarint(b, p1)
          out += Field(num, wt, len, b.slice(p2, p2 + len.toInt)); p = p2 + len.toInt
        case other => fail(s"unexpected wire type $other at offset $p")
      }
    }
    out.result()
  }
  private def unhex(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("non-ASCII label values frame with UTF-8 BYTE length prefixes") {
    import spark.implicits._
    // 2-, 3- and 4-byte UTF-8 code points; char count << byte count
    val evil = Seq("café", "покупка", "支付_完了", "emoji_😀_done")
    val df = evil.zipWithIndex
      .map { case (et, i) => (et, 1700000000000L + i, "events_total", 1.0 + i) }
      .toDF("event_type", "ts_ms", "metric_name", "value")
    val rows = PromWire.encodeSamples(df)
      .selectExpr("event_type", "value", "ts_ms", "wire_hex").collect()
    assert(rows.length == evil.size)
    rows.foreach { r =>
      val et = r.getString(0)
      val wire = unhex(r.getString(3))
      val wr = fields(wire)
      assert(wr.map(f => (f.num, f.wireType)) == Seq((1, 2)),
        s"$et: frame must be one length-delimited TimeSeries")
      val ts = fields(wr.head.bytes)
      val labels = ts.filter(_.num == 1).map { lf =>
        val kv = fields(lf.bytes)
        (new String(kv.find(_.num == 1).get.bytes, "UTF-8"),
          kv.find(_.num == 2).map(f => new String(f.bytes, "UTF-8")).getOrElse(""))
      }
      // the event_type label must round-trip BYTE-exactly — under the
      // old character-count prefix the decoder would mis-frame here
      assert(labels.contains(("event_type", et)), s"decoded labels: $labels")
      val sample = fields(ts.filter(_.num == 2).head.bytes)
      assert(java.lang.Double.longBitsToDouble(sample.find(_.num == 1).get.varint)
        == r.getDouble(1))
      assert(sample.find(_.num == 2).get.varint == r.getLong(2))
    }
  }

  test("ann_knn_graph cap: shipped SFs stay single-shard, and a sampled brute force confirms exactness") {
    import graft.operators.Similarity
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    // claim pinned in the scaladoc: every shipped SF's label blocks fit
    // under KnnGraphCap, so shard = x % 1 = 0 and the capped graph IS
    // the uncapped exact in-block kNN (the truth Round11bSpec's IVF
    // recall is measured against). If a testdata vintage ever exceeds
    // the cap, this fails and the exactness claims must be revisited.
    val maxBlock = raw.groupBy("label").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxBlock <= Similarity.KnnGraphCap,
      s"label block $maxBlock exceeds KnnGraphCap ${Similarity.KnnGraphCap}")

    // sampled brute-force verifier: for 5 vectors, every reported
    // neighbor's cosine recomputes to the reported value and no
    // in-block vector beats the reported k-th neighbor
    val vecs = raw.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val graph = SparkEntry.queries("ann_knn_graph")(spark, sf)
      .collect().groupBy(_.getLong(0))
    val sample = vecs.sortBy(_._1).take(5)
    sample.foreach { case (id, label, v) =>
      val reported = graph(id).sortBy(_.getInt(4)) // by rank
      assert(reported.length == Similarity.KnnGraphK)
      val block = byLabel(label).filter(_._1 != id)
      val exact = block.map { case (nid, _, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
      reported.zip(exact).foreach { case (rep, (eid, ecos)) =>
        val repCos = rep.getDouble(3) // trunc4'd
        assert(math.abs(math.floor(ecos * 1e4) / 1e4 - repCos) <= 1e-4 + 1e-9,
          s"vec $id: reported ${rep.getLong(2)}@$repCos vs exact $eid@$ecos")
      }
      // no in-block vector beats the k-th reported neighbor materially
      val kth = reported.last.getDouble(3)
      val beat = exact.drop(Similarity.KnnGraphK).headOption.map(_._2).getOrElse(-2.0)
      assert(beat <= kth + 1e-3, s"vec $id: unreported neighbor at $beat beats k-th $kth")
    }
  }

  // ------------------------------------------------ round-12 operators

  test("metrics_ha_dedup: election keeps the majority replica, ties prefer replica 0, counts conserve") {
    val rows = SparkEntry.queries("metrics_ha_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n0, n1) = (r.getAs[Long]("n_r0"), r.getAs[Long]("n_r1"))
      val el = r.getAs[Int]("elected_replica")
      assert(el == (if (n1 > n0) 1 else 0), s"election broke majority/tie rule: $r")
      assert(r.getAs[Long]("n_kept") == (if (el == 0) n0 else n1))
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == n0 + n1)
      assert(r.getAs[Long]("n_kept") >= r.getAs[Long]("n_dropped"))
    }
  }

  test("metrics_scrape_jitter: median is an observed interval, share in [0,1], gap >= median") {
    val rows = SparkEntry.queries("metrics_scrape_jitter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("jitter_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("max_gap_sec") >= r.getAs[Long]("median_iv_sec"))
      assert(r.getAs[Long]("n_jitter") <= r.getAs[Long]("n_intervals"))
    }
  }

  test("prom_subquery_max_rate: outer max equals the trailing-12-step max of inner counts") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("prom_subquery_max_rate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("n_max")).toMap
    // independent recompute of the inner step counts
    val step = graft.operators.PromQl.SubStepSec
    val counts = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        expr(s"((unix_timestamp(date_trunc('second', ts)) + ${step - 1}) DIV $step) * $step")
          .as("t"))
      .groupBy(col("event_type"), col("t")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sample = out.keys.toSeq.sortBy(k => (k._1, k._2)).grouped(97).map(_.head).toSeq
    sample.foreach { case (et, t) =>
      val window = (0 until graft.operators.PromQl.SubWinSteps)
        .flatMap(i => counts.get((et, t - i * step)))
      assert(window.nonEmpty && window.max == out((et, t)),
        s"($et, $t): reported ${out((et, t))} vs recomputed ${window.maxOption}")
    }
    // absence rule: a grid point with an all-empty 6h trail emits nothing
    out.keys.foreach { case (et, t) =>
      assert((0 until graft.operators.PromQl.SubWinSteps)
        .exists(i => counts.contains((et, t - i * step))))
    }
  }

  test("prom_native_histogram_sum: merged histogram conserves mass and matches per-series buckets") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("prom_native_histogram_sum")(spark, sf)
      .orderBy(col("idx")).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("cnt")).sum == total, "mass not conserved")
    assert(rows.last.getAs[Long]("cum") == total)
    assert(math.abs(rows.last.getAs[Double]("mass_share") - 1.0) < 1e-9)
    val nSeries = graft.sources.Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(rows.forall(r => r.getAs[Long]("n_series") >= 1 &&
      r.getAs[Long]("n_series") <= nSeries))
  }

  test("dedup_normalized_exact: canonical groups never exceed raw groups; the rule itself merges formatting variants") {
    val rows = SparkEntry.queries("dedup_normalized_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_canon_groups") <= r.getAs[Long]("n_raw_groups"))
      assert(r.getAs[Long]("n_raw_groups") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_merged_by_normalization") ==
        r.getAs[Long]("n_raw_groups") - r.getAs[Long]("n_canon_groups"))
    }
    // the canonicalization rule on literal formatting variants: case,
    // punctuation and whitespace-run differences hash identically —
    // with the EXPLICIT whitespace class (Java \s matches \x0B where
    // RE2 does not; the explicit class behaves like RE2 in both)
    val c = spark.sql(
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(x), '[.,;:!?]', ''),
                                        '[ \\t\\n\\r\\f]+', ' '))) AS h
         FROM VALUES ('The  quick, fox!'), ('the quick fox'), ('THE QUICK\tFOX.') v(x)""")
      .collect().map(_.getString(0)).distinct
    assert(c.length == 1, s"formatting variants must canonicalize to one hash, got $c")
    // vertical tab is NOT whitespace under the explicit class (the
    // RE2-compatible choice): a \x0B-joined variant must NOT merge
    val v = spark.sql(
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(x), '[.,;:!?]', ''),
                                        '[ \\t\\n\\r\\f]+', ' '))) AS h
         FROM VALUES ('a b'), (concat('a', char(11), 'b')) v(x)""")
      .collect().map(_.getString(0)).distinct
    assert(v.length == 2, "vertical tab must not collapse — RE2 parity")
  }

  test("mix_anneal_schedule: each phase apportions its exact budget; anneal up-weights the top quality half") {
    import graft.operators.Curation._
    val rows = SparkEntry.queries("mix_anneal_schedule")(spark, sf).collect()
    val byPhase = rows.groupBy(_.getAs[Int]("phase"))
    assert(byPhase.keySet == Set(1, 2))
    val p2 = AnnealBudget / AnnealPhase2Den
    assert(byPhase(1).map(_.getAs[Long]("alloc")).sum == AnnealBudget - p2,
      "phase-1 allocations must sum exactly to the phase budget")
    assert(byPhase(2).map(_.getAs[Long]("alloc")).sum == p2)
    val weights = byPhase(2).map(r => r.getAs[Long]("weight")).sorted
    val nSrc = byPhase(2).length
    assert(weights.count(_ == AnnealUpWeight) == nSrc / 2,
      "exactly the top half (floor) of sources carries the anneal up-weight")
    assert(weights.forall(w => w == 1L || w == AnnealUpWeight))
    // phase 1 ignores the weight: allocations are volume-proportional
    // (largest remainder => off by at most 1 from the real quota)
    val toks = graft.sources.Tables.documents(spark, sf)
      .selectExpr("source", s"size(${graft.operators.TextAnalysis.toksExpr}) AS nt")
      .groupBy("source").sum("nt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tw = toks.values.sum
    byPhase(1).foreach { r =>
      val exact = (AnnealBudget - p2).toDouble * toks(r.getAs[String]("source")) / tw
      assert(math.abs(r.getAs[Long]("alloc") - exact) <= 1.0,
        s"phase-1 alloc drifted from the volume quota: $r vs $exact")
    }
  }

  test("stream_ha_dedup: a real MemoryStream run elects exactly the batch twin's replicas") {
    import graft.streaming.EventsStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val samples = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_timestamp(date_trunc('second', ts)) AS tsSec",
        "CAST(event_id % 2 AS INT) AS replica")
      .as[EventsStream.HaSample].collect()
    val input = MemoryStream[EventsStream.HaSample]
    val q = EventsStream.haDedupStream(input.toDS())
      .writeStream.format("memory").queryName("ha_sink")
      .outputMode(OutputMode.Append).start()
    try {
      val sorted = samples.sortBy(_.tsSec)
      val (early, late) = sorted.splitAt(sorted.length / 2)
      input.addData(early.toSeq); q.processAllAvailable()
      input.addData(late.toSeq); q.processAllAvailable()
      // hour-aligned sentinel far past the data closes every window
      val sentinelSec = (sorted.last.tsSec / 3600L + 4L) * 3600L
      input.addData(EventsStream.HaSample("__wm__", sentinelSec, 0))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5), r.getLong(6))
      val got = spark.table("ha_sink").collect()
        .filter(_.getString(1) != "__wm__").map(key).toMap
      val dupes = spark.table("ha_sink").collect().groupBy(r =>
        (r.getTimestamp(0).getTime, r.getString(1))).filter(_._2.length > 1)
      assert(dupes.isEmpty, "a window's election emitted twice")
      val want = EventsStream.haDedupBatch(spark, sf).collect().map(key).toMap
      assert(got == want,
        s"stream/batch fork: ${ (want.toSet -- got.toSet).take(2) } / ${ (got.toSet -- want.toSet).take(2) }")
    } finally q.stop()
  }

  test("v2 symbol entries carry byte-length prefixes for non-ASCII symbols") {
    // drive the generated SQL fragment directly: the same strByteLen
    // arithmetic the v2 symbol table uses, over a literal row
    val hex = spark.sql(
      "SELECT lower(hex('покупка')) AS h, (length(lower(hex('покупка'))) div 2) AS blen")
      .collect().head
    assert(hex.getString(0).length / 2 == 14) // 7 Cyrillic chars × 2 bytes
    assert(hex.getLong(1) == 14L)             // the prefix the encoder now emits
  }
}
