package graft

import graft.operators.{Pipeline, Similarity, TimeseriesExt}

/** Round-10 widening, second batch: purged walk-forward CV, SAX motif
  * mining, and embedding-table dimension QA. Semantics checked against
  * driver-side brute forces; the DuckDB gate separately checks engine
  * parity on the real tables. */
class Round10dSpec extends SparkTestBase {

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10d").toString
    rows.map { case (id, tsSec, et, v) =>
      (id, new java.sql.Timestamp(tsSec * 1000L), id % 7, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------------ split_purged_cv

  test("split_purged_cv replays the fold ladder and purge discipline") {
    // day d at epoch of 2024-01-01 + d days (the entry anchors there)
    val day0 = java.time.LocalDate.parse("2024-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    def at(d: Int) = day0 + d * 86400L + 3600L
    // users: 1 active early+late (overlaps), 2 only early, 3 only late
    val raw = Seq(
      (1L, at(0), 1L), (2L, at(1), 2L), (3L, at(3), 1L), (4L, at(4), 2L),
      (5L, at(5), 3L), (6L, at(6), 1L), (7L, at(8), 3L),
      (8L, at(10), 2L), (9L, at(12), 1L), (10L, at(14), 3L),
      (11L, at(16), 1L), (12L, at(19), 2L), (13L, at(21), 1L), (14L, at(24), 3L))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10d_cv").toString
    raw.map { case (id, ts, uid) =>
      (id, new java.sql.Timestamp(ts * 1000L), uid, "t", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Pipeline.splitPurgedCv(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val days = raw.map { case (id, ts, uid) => (uid, ((ts - day0) / 86400L).toInt) }
    val expected = (1 to Pipeline.CvFolds).map { k =>
      val te = k * (Pipeline.CvPurgeDays + Pipeline.CvTestDays)
      val ts0 = te + Pipeline.CvPurgeDays
      val nTrain = days.count(_._2 < te)
      val nPurge = days.count(d => d._2 >= te && d._2 < ts0)
      val nTest = days.count(d => d._2 >= ts0 && d._2 < ts0 + Pipeline.CvTestDays)
      val overlap = days.groupBy(_._1).count { case (_, ds) =>
        ds.exists(_._2 < te) && ds.exists(d => d._2 >= ts0 && d._2 < ts0 + Pipeline.CvTestDays)
      }
      k -> (te, nTrain.toLong, nPurge.toLong, nTest.toLong, overlap.toLong)
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // ladder property: training sets only grow; roles are disjoint per fold
    val trains = (1 to Pipeline.CvFolds).map(k => got(k)._2)
    assert(trains == trains.sorted, "walk-forward training sets must be monotone")
    got.values.foreach { case (_, tr, pu, te2, _) =>
      assert(tr + pu + te2 <= raw.size, "fold roles overlap")
    }
  }

  // --------------------------------------------- metrics_sax_motifs

  /** Driver-side SAX replay with the entry's exact integer pipeline. */
  private def saxWord(hourly: Seq[(Int, Seq[Double])]): Option[String] = {
    if (hourly.size != 24) None
    else {
      val vq = hourly.sortBy(_._1).map { case (_, vs) =>
        val sum2 = math.round(vs.sum * 100.0) / 100.0
        math.floor(sum2 / vs.size * 1e4).toLong
      }
      val n = 24L
      val sTot = vq.sum; val ss = vq.map(q => q * q).sum
      val varNum = n * ss - sTot * sTot
      val word = (0 until TimeseriesExt.SaxSegs).map { g =>
        val seg = vq.slice(g * 4, g * 4 + 4)
        val num = seg.sum * n - sTot * seg.size
        val z = if (varNum <= 0) 0.0
          else num.toDouble / (seg.size.toDouble * math.sqrt(varNum.toDouble))
        if (z < -0.6745) 'a' else if (z < 0.0) 'b' else if (z < 0.6745) 'c' else 'd'
      }.mkString
      Some(word)
    }
  }

  test("metrics_sax_motifs symbolizes shapes and drops partial days") {
    // series r: a clean ramp day (word abbccd-ish, replayed exactly)
    // series f: a flat day -> zero variance -> all-'c'
    // series p: 23 hours only -> excluded
    // series s: midday spike day
    val rows = Seq.newBuilder[(Long, Long, String, Double)]
    var id = 0L
    def add(et: String, day: Int, hour: Int, v: Double): Unit = {
      id += 1; rows += ((id, day * 86400L + hour * 3600L + 60L, et, v))
    }
    (0 until 24).foreach(h => add("r", 0, h, 1.0 + h))
    (0 until 24).foreach(h => add("f", 0, h, 7.77))
    (0 until 23).foreach(h => add("p", 0, h, 1.0 + h))
    (0 until 24).foreach(h => add("s", 0, h, if (h >= 10 && h < 14) 100.0 else 1.0))
    val dir = writeEvents(rows.result())
    val got = TimeseriesExt.saxMotifs(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    def wordOf(et: String) = saxWord(
      rows.result().filter(_._3 == et).groupBy(t => ((t._2 % 86400) / 3600).toInt)
        .map { case (h, ts) => (h, ts.map(_._4)) }.toSeq).get
    val expected = Seq("r", "f", "s").map(wordOf).groupBy(identity)
      .map { case (w, ws) => w -> (ws.size.toLong, ws.size.toLong) }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(wordOf("f") == "cccccc", "zero-variance day is all-'c'")
    assert(wordOf("r").toSeq == wordOf("r").toSeq.sorted, "ramp word is monotone in the alphabet")
    val spike = wordOf("s")
    assert(spike.substring(2, 4).contains('d') && spike.head < 'c',
      s"midday spike word surprises in segments 2-3: $spike")
  }

  // ---------------------------------------------- metrics_theil_sen

  test("metrics_theil_sen shrugs off the outlier that swings least squares") {
    // clean ramp value = h, except hour 12 glitches to 1000.
    // LSQ slope over this day is ~> 2x the true slope; Theil-Sen's
    // pairwise median stays ~1/hour.
    val rows = (0 until 24).map { h =>
      ((h + 1).toLong, h * 3600L + 30L, "g", if (h == 12) 1000.0 else 1.0 + h)
    } ++ (0 until 24).map { h => ((100 + h).toLong, h * 3600L + 30L, "clean", 5.0 + 2.0 * h) }
    val dir = writeEvents(rows)
    val got = TimeseriesExt.theilSen(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got("clean")._1 == 276L)
    assert(got("clean")._2 == 2.0, s"clean ramp slope: ${got("clean")}")
    val g = got("g")._2
    assert(g >= 0.9 && g <= 1.2, s"outlier swung the robust slope: $g")
    // replay: lower median of all pairwise slopes on the exact grid
    val vq = (0 until 24).map(h => math.floor(
      math.round((if (h == 12) 1000.0 else 1.0 + h) * 100.0) / 100.0 * 1e4).toLong)
    val slopes = (for {
      i <- 0 until 23; j <- i + 1 until 24
    } yield (vq(j) - vq(i)).toDouble / (j - i).toDouble).sorted
    assert(g == math.floor(slopes(137) * 100) / 1e6, "entry != driver-side replay")
  }

  // -------------------------------------- metrics_alert_for_duration

  test("alert for-duration: pending clock, firing, gap reset, below reset") {
    // series "a": 2 hot hours (pending only) / below / 4 hot hours
    // (pending, pending, firing, firing) / GAP at hour 11 / 2 hot
    // hours after the gap must restart from pending
    val hot = 100.0; val cold = 1.0
    val hours = Seq(
      0 -> hot, 1 -> hot,          // run of 2: never fires
      2 -> cold,                   // below reset
      3 -> hot, 4 -> hot, 5 -> hot, 6 -> hot, // pending x2 then firing x2
      7 -> cold,
      9 -> hot, 10 -> hot,         // run of 2...
      // hour 11 MISSING (gap)
      12 -> hot, 13 -> hot, 14 -> hot) // ...gap resets: pending x2, firing
    val rows = hours.zipWithIndex.map { case ((h, v), i) =>
      ((i + 1).toLong, h * 3600L + 120L, "a", v)
    }
    val dir = writeEvents(rows)
    val got = TimeseriesExt.alertForDuration(spark, dir).collect()
      .map(r => (r.getLong(1) / 3600).toInt -> (r.getInt(3), r.getString(4))).toMap
    val want = Map(
      0 -> (1, "pending"), 1 -> (2, "pending"),
      2 -> (0, "inactive"),
      3 -> (1, "pending"), 4 -> (2, "pending"), 5 -> (3, "firing"), 6 -> (4, "firing"),
      7 -> (0, "inactive"),
      9 -> (1, "pending"), 10 -> (2, "pending"),
      12 -> (1, "pending"), 13 -> (2, "pending"), 14 -> (3, "firing"))
    assert(got == want, s"got $got\nexpected $want")
  }

  // ---------------------------------------------- emb_pca_power

  test("emb_pca_power recovers a planted dominant axis") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10d_pca").toString
    // 40 vectors = t * axis + small deterministic off-axis wiggle;
    // axis concentrated on dims 1-2, dims 3+ near-dead
    val axis = Array.fill(64)(0.0f); axis(0) = 0.8f; axis(1) = 0.6f
    val vecs = (1 to 40).map { r =>
      val t = (r - 20) / 20.0f
      val v = axis.map(_ * t)
      v(2) = (if (r % 2 == 0) 0.01f else -0.01f)
      (r.toLong, v.toSeq, r % 3)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embPcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 64)
    val v = got.sortBy(_._1).map(_._2)
    val n2 = v.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"loadings not unit-norm: $n2")
    val cosAxis = math.abs(v(0) * 0.8 + v(1) * 0.6) / math.sqrt(n2)
    assert(cosAxis > 0.999, s"planted axis not recovered: cos=$cosAxis, head=${v.take(3).toSeq}")
    assert(v.drop(3).forall(x => math.abs(x) < 0.01), "dead dims carry loading")
    val share = got.head._3
    assert(share > 0.99, s"PC1 share should dominate this rank-1-ish table: $share")
  }

  // ------------------------------------------------- emb_dim_stats

  test("emb_dim_stats finds dead and dominant dimensions exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10d_emb").toString
    // dim1: healthy centered; dim2: DEAD (constant); dim3: dominant
    // (mean far above spread); dim4: healthy wide
    val vecs = Seq(
      (1L, Seq(0.5f, 0.25f, 3.0f, -1.0f), 0),
      (2L, Seq(-0.5f, 0.25f, 3.1f, 1.0f), 1),
      (3L, Seq(0.25f, 0.25f, 2.9f, 0.0f), 0),
      (4L, Seq(-0.25f, 0.25f, 3.0f, 2.0f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.embDimStats(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6), r.getBoolean(7)))).toMap

    val expected = (0 until 4).map { i =>
      val qs = vecs.map(v => math.floor(v._2(i).toDouble * 1e6).toLong)
      val n = qs.size.toLong
      val s = qs.sum; val ss = qs.map(q => BigInt(q) * BigInt(q)).sum
      val varNum = BigInt(n) * ss - BigInt(s) * BigInt(s)
      val mean = math.floor(s.toDouble / n.toDouble) / 1e6
      val std = math.floor(math.sqrt(varNum.toDouble) / n.toDouble) / 1e6
      (i + 1) -> ((n, mean, std, qs.min.toDouble / 1e6, qs.max.toDouble / 1e6,
        varNum == 0, math.abs(s.toDouble) > 2 * math.sqrt(varNum.toDouble)))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got(2)._6 && !got(1)._6, "dim2 dead, dim1 not")
    assert(got(3)._7 && !got(1)._7, "dim3 dominant, dim1 not")
  }

  test("emb_dim_stats aggregates before the shuffle (map-side combine on dims)") {
    // partial aggregation must appear below the exchange: the shuffle
    // carries |dims|-keyed partials, not exploded vector volume
    val p = plan("emb_dim_stats")
    assert(p.contains("hashpartitioning("), "no hash exchange for the dim aggregation")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation: the shuffle would carry exploded vector volume")
    assert(countNodes(p, "Exchange") <= 2, s"more shuffles than agg+sort:\n$p")
  }
}
